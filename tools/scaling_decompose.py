"""Decompose WHICH pipeline term caps 8->32 scaling (VERDICT r2 item 2).

Runs, at local[8] and local[32] in their own JVMs over the same tmpfs parquet:
  scan         — parquet scan + count (no shuffle, no Python)
  scan_agg     — scan + ungrouped aggregate (tests pure map-side CPU scale)
  shuffle      — scan + repartition(conv_id) + count (exchange write+read)
  window       — scan + sessionize window (exchange + sort + lag + cumsum)
  exact_sql    — the full exact-domain feature SQL (adds the hash aggregate)
  kernel       — the fused Arrow kernel (adds the Python/Arrow boundary)

E(8->32) per stage isolates the non-scaling term: if `scan` already caps at
X, the VM's memory bandwidth / IO path is the ceiling, not the engine.

Usage: python tools/scaling_decompose.py [n_convs]   (writes BENCH/DECOMPOSE.md)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

from harness import REPO, append_bench, tool_spark, utc_stamp

LEVELS = [8, 32]

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from flow_feature_spark.session import get_spark
from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
from flow_feature_spark.features import session_features_exact_sql
from flow_feature_spark.sessionize import assign_sessions
from pyspark.sql import functions as F

cpus, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"decomp_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus)
stored = spark.read.parquet(path)

def scan():
    return stored.count()

def scan_agg():
    t = normalize_turns(stored)
    return t.agg(F.sum("plen"), F.sum("win"), F.max("ts_us"),
                 F.sum(F.length("text"))).collect()[0][0]

def shuffle():
    return normalize_turns(stored).repartition(2 * cpus, "conv_id").count()

def window():
    return assign_sessions(normalize_turns(stored), 1800.0).agg(
        F.sum("session_id")).collect()[0][0]

def exact_sql():
    return session_features_exact_sql(normalize_turns(stored), 1800.0).count()

def kernel():
    return sessionize_and_extract_fast(normalize_turns(stored), 1800.0,
                                       rounding="r6",
                                       num_partitions=2 * cpus).count()

out = {{"cpus": cpus}}
for name, job in (("scan", scan), ("scan_agg", scan_agg), ("shuffle", shuffle),
                  ("window", window), ("exact_sql", exact_sql), ("kernel", kernel)):
    job()  # warm-up
    times = []
    for _ in range(3):
        t0 = time.time(); job(); times.append(time.time() - t0)
    times.sort()
    out[name] = {{"median": round(times[1], 3), "all": [round(t, 3) for t in times]}}
spark.stop()
print("RESULT " + json.dumps(out))
"""


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    from flow_feature_spark.synth import synth_transcripts

    path = os.path.join(tempfile.mkdtemp(prefix="ffs_decomp_", dir="/dev/shm"),
                        "transcripts")
    spark = tool_spark("decomp_gen", cpus=32,
                      shuffle_partitions=64)
    synth_transcripts(spark, n_convs=n_convs, turns_mean=60, hot_factor=100,
                      partitions=64).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()

    worker = WORKER.format(repo=REPO)
    results = {}
    for cpus in LEVELS:
        proc = subprocess.run(
            [sys.executable, "-c", worker, str(cpus), path],
            capture_output=True, text=True, timeout=7200,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stderr[-3000:])
            raise RuntimeError(f"worker local[{cpus}] failed")
        results[cpus] = json.loads(line[-1][len("RESULT "):])
        print(json.dumps(results[cpus]))

    stages = ["scan", "scan_agg", "shuffle", "window", "exact_sql", "kernel"]
    stamp = utc_stamp()
    md = [
        "", f"## Stage decomposition ({stamp}) — which term caps 8->32",
        "",
        f"Input: {n:,} turns (tmpfs parquet); median of 3 after warm-up, own"
        " JVM per level; shuffle partitions = 2 x cores.",
        "",
        "| stage | local[8] s | local[32] s | E(8->32) |",
        "|---|---|---|---|",
    ]
    for s in stages:
        t8 = results[8][s]["median"]
        t32 = results[32][s]["median"]
        e = t8 / (4 * t32)
        md.append(f"| {s} | {t8} | {t32} | **{e:.2f}** |")
    md += [
        "",
        "E(8->32) = t(8) / (4 x t(32)) — same-input speedup over the 4x core",
        "step. Each stage adds one term to the one above it: scan (IO +",
        "decode), scan_agg (+ map-side expression CPU), shuffle (+ exchange",
        "write/read), window (+ per-key sort/lag/cumsum), exact_sql (+ hash",
        "aggregate), kernel (+ Arrow boundary + Python).",
        "",
        "Raw:", "```json", json.dumps(results, indent=2), "```",
    ]
    append_bench("DECOMPOSE.md", "\n".join(md))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
