"""N vs 4N scaling evidence for the bucketized interval join.

Runs the keyless bucketized join (2M intervals x 200M probes, ~160M output
pairs) at local[8] and local[32], each level in its OWN JVM (subprocess) per
the BENCH/BASELINE.md protocol, best-of-3 per level. Appends the table to
BENCH/RANGEJOIN.md.

Run on an otherwise-idle machine: python tools/bench_rangejoin_scaling.py
"""

from __future__ import annotations

from harness import append_bench, run_worker

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from flow_feature_spark.rangejoin import interval_join_bucketed
from flow_feature_spark.session import get_spark

cpus = int(sys.argv[1])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
                  app_name=f"rj_scale_{cpus}")
N_IV, N_PR = 2_000_000, 200_000_000
iv = spark.range(N_IV).select(
    (F.col("id") * 1_000_000).alias("start_us"),
    (F.col("id") * 1_000_000 + 800_000).alias("end_us"),
    F.col("id").alias("tag"),
).persist()
pr = spark.range(N_PR).select(
    ((F.col("id") * 37) % (N_IV * 1_000_000)).alias("ts_us")
).persist()
iv.count(); pr.count()
best, pairs = float("inf"), 0
for _ in range(3):
    t0 = time.time()
    pairs = interval_join_bucketed(iv, pr, entity_cols=(), bucket_us=1_000_000).count()
    best = min(best, time.time() - t0)
print(json.dumps({"cpus": cpus, "best_s": best, "pairs": pairs,
                  "probes_per_s": N_PR / best}))
spark.stop()
"""


def main() -> int:
    rows = {}
    for cpus in (8, 32):
        rows[cpus] = run_worker(WORKER, str(cpus))
        print(rows[cpus])
    e_ideal = rows[32]["probes_per_s"] / (4 * rows[8]["probes_per_s"])
    table = "\n".join([
        "",
        "## Scaling: keyless bucketized join, local[8] vs local[32]",
        "",
        "Own JVM per level, best-of-3; 2M intervals x 200M probes"
        f" -> {rows[32]['pairs']:,} pairs.",
        "",
        "| cores | best s | probes/s |",
        "|---|---|---|",
        f"| 8 | {rows[8]['best_s']:.2f} | {rows[8]['probes_per_s']:,.0f} |",
        f"| 32 | {rows[32]['best_s']:.2f} | {rows[32]['probes_per_s']:,.0f} |",
        "",
        f"E(8->32) ideal = {e_ideal:.2f}"
        " (compare the same-day pure-CPU ceiling in BENCH/BASELINE.md — the"
        " VM itself does not scale 4x over this range).",
    ]) + "\n"
    append_bench("RANGEJOIN.md", table)
    print(table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
