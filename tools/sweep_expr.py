"""Shuffle-partition / AQE sweep for the feature_expr path (VERDICT round-1:
feature_expr was SLOWER at local[32] (3.76 s) than local[8] (1.89 s) with high
variance — find the knee or the root cause).

Each (cores, shuffle_partitions, aqe) cell runs in its OWN JVM: 1 warm-up
discarded, median of 3. Input: the standard 3.5M-turn synthetic transcript
table on tmpfs. Usage: python tools/sweep_expr.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

from harness import REPO, tool_spark

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from flow_feature_spark.session import get_spark
from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.sessionize import assign_sessions
from flow_feature_spark.features import session_features_expr

cpus, parts, aqe, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
spark = get_spark(app_name=f"sweep_{{cpus}}_{{parts}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=parts,
                  extra_conf={{"spark.sql.adaptive.enabled": aqe}})
stored = spark.read.parquet(path)
def job():
    return session_features_expr(assign_sessions(normalize_turns(stored), 1800.0)).count()
job()  # warm-up
times = []
for _ in range(3):
    t0 = time.time(); job(); times.append(round(time.time() - t0, 3))
times.sort()
print("RESULT " + json.dumps({{"cpus": cpus, "parts": parts, "aqe": aqe,
                               "median": times[1], "all": times}}))
spark.stop()
"""


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    from flow_feature_spark.synth import synth_transcripts

    path = os.path.join(tempfile.mkdtemp(prefix="ffs_sweep_", dir="/dev/shm"),
                        "transcripts")
    spark = tool_spark("sweep_gen", cpus=32, shuffle_partitions=64)
    synth_transcripts(spark, n_convs=n_convs, turns_mean=60, hot_factor=100)\
        .write.mode("overwrite").parquet(path)
    spark.stop()

    worker = WORKER.format(repo=REPO)
    grid = [
        (8, 16, "true"), (8, 16, "false"),
        (32, 16, "true"), (32, 32, "true"), (32, 64, "true"),
        (32, 128, "true"), (32, 64, "false"), (32, 32, "false"),
    ]
    results = []
    for cpus, parts, aqe in grid:
        proc = subprocess.run(
            [sys.executable, "-c", worker, str(cpus), str(parts), aqe, path],
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            print(proc.stderr[-2000:])
            raise RuntimeError(f"cell {cpus}/{parts}/{aqe} failed")
        r = json.loads(lines[-1][len("RESULT "):])
        results.append(r)
        print(json.dumps(r))
    print("SWEEP " + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
