"""Measure the interval-join bucket decomposition against the naive plans.

Two regimes where the naive non-equi formulation collapses and the bucketized
equi join does not:

  A. keyless pure range join — naive plans BroadcastNestedLoopJoin
     (|intervals| x |probes| comparisons);
  B. hot entity — naive equi-joins on entity alone, so the hot key's
     candidate pairs (n_iv_hot x n_probe_hot) all materialize in one task
     before the range filter.

Deterministic synthetic input (no testdata dependency); both sides verified
to return the SAME pair count before timing. Results -> BENCH/RANGEJOIN.md.

Run on an otherwise-idle machine: python tools/bench_rangejoin.py
"""

from __future__ import annotations

import os
import time

from harness import BENCH_DIR, best_of, tool_spark


def _timed(fn, n=3):
    return best_of(fn, n=n)[0]


def main() -> int:
    from pyspark.sql import functions as F

    from flow_feature_spark.rangejoin import (
        interval_join_bucketed,
        interval_join_naive,
    )
    spark = tool_spark("rj_bench", cpus=32)
    lines: list[str] = [
        "# Interval (range) join: bucketized vs naive",
        "",
        "`tools/bench_rangejoin.py`, local[32], naive timed once / bucketized best-of-3, deterministic",
        "synthetic input, pair counts verified equal before timing.",
        "",
        "| scenario | intervals | probes | pairs | naive plan | naive s | bucketized s | speedup |",
        "|---|---|---|---|---|---|---|---|",
    ]

    # --- A: keyless pure range join --------------------------------------
    n_iv, n_pr = 50_000, 500_000
    iv = spark.range(n_iv).select(
        (F.col("id") * 1_000_000).alias("start_us"),
        (F.col("id") * 1_000_000 + 800_000).alias("end_us"),
        F.col("id").alias("tag"),
    ).cache()
    pr = spark.range(n_pr).select(
        ((F.col("id") * 37) % (n_iv * 1_000_000)).alias("ts_us")
    ).cache()
    iv.count(), pr.count()

    def a_naive():
        return interval_join_naive(iv, pr, entity_cols=()).count()

    def a_bucket():
        return interval_join_bucketed(iv, pr, entity_cols=(), bucket_us=1_000_000).count()

    assert a_naive() == a_bucket(), "scenario A pair counts diverge"
    pairs_a = a_bucket()
    t_naive_a = _timed(a_naive, n=1)
    t_bucket_a = _timed(a_bucket)
    lines.append(
        f"| A keyless | {n_iv:,} | {n_pr:,} | {pairs_a:,} | BroadcastNestedLoopJoin "
        f"| {t_naive_a:.2f} | {t_bucket_a:.2f} | {t_naive_a / t_bucket_a:.1f}x |"
    )

    # --- B: hot entity ----------------------------------------------------
    # 'hot' owns n_hot intervals and most probes; 200 cold entities pad the key
    # space. Naive equi-joins on entity alone: the hot key materializes
    # n_hot x n_probe_hot candidate rows in one task before filtering.
    n_hot_iv, n_hot_pr = 10_000, 200_000
    hot_iv = spark.range(n_hot_iv).select(
        F.lit("hot").alias("entity_id"),
        (F.col("id") * 1_000_000).alias("start_us"),
        (F.col("id") * 1_000_000 + 800_000).alias("end_us"),
        F.col("id").alias("tag"),
    )
    cold_iv = spark.range(200).select(
        F.concat(F.lit("c"), F.col("id")).alias("entity_id"),
        F.lit(0).alias("start_us"),
        F.lit(800_000).alias("end_us"),
        (F.col("id") + 10_000_000).alias("tag"),
    )
    ivb = hot_iv.unionByName(cold_iv).cache()
    hot_pr = spark.range(n_hot_pr).select(
        F.lit("hot").alias("entity_id"),
        ((F.col("id") * 37) % (n_hot_iv * 1_000_000)).alias("ts_us"),
    )
    cold_pr = spark.range(200).select(
        F.concat(F.lit("c"), F.col("id")).alias("entity_id"),
        (F.col("id") % 800_000).alias("ts_us"),
    )
    prb = hot_pr.unionByName(cold_pr).cache()
    ivb.count(), prb.count()

    def b_naive():
        return interval_join_naive(ivb, prb).count()

    def b_bucket():
        return interval_join_bucketed(ivb, prb, bucket_us=1_000_000).count()

    assert b_naive() == b_bucket(), "scenario B pair counts diverge"
    pairs_b = b_bucket()
    t_naive_b = _timed(b_naive, n=1)
    t_bucket_b = _timed(b_bucket)
    lines.append(
        f"| B hot entity | {n_hot_iv + 200:,} | {n_hot_pr + 200:,} | {pairs_b:,} "
        f"| equi(entity) + filter, hot key in 1 task "
        f"| {t_naive_b:.2f} | {t_bucket_b:.2f} | {t_naive_b / t_bucket_b:.1f}x |"
    )

    lines += [
        "",
        "The bucketized path's cost is the interval explode (span/bucket_us rows",
        "per interval) plus a shuffled hash join on (entity, bucket) — partition",
        "count scales with the key space, not with any single key's row count;",
        "AQE skew-split applies to the join like any other equi join. The naive",
        "forms degrade combinatorially in exactly the two regimes above, which is",
        "why `rangejoin.interval_join_naive` is labeled test-scale-only.",
        "",
        f"Environment note: shared VM; spreads up to 4x under co-tenant steal",
        f"(BENCH/BASELINE.md) — best-of-3 minima shown.",
    ]
    out = "\n".join(lines) + "\n"
    # full rewrite on purpose: top-of-file snapshot; scaling/skew sections append
    with open(os.path.join(BENCH_DIR, "RANGEJOIN.md"), "w") as f:
        f.write(out)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
