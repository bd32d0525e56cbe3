"""Time-series + fuzzy-join operators at scale.

Four workloads on a deterministic ~30M-event synthetic stream (one user at
~100x the median event count — the skew surface), plus the deletion-
neighborhood fuzzy join at 10^6 short strings:

  * resample_counts: 30M irregular events -> dense 6h grid (zero fill +
    forward fill). The structural claim to verify: a hot ENTITY does not
    produce a hot grid task, because its grid is bounded by span/bucket
    (120 cells over 30 days), not by its event count.
  * decayed_counts: the 21-lag exact half-life window over the full grid.
  * merge_intervals: per-user activity islands over 30M [ts, ts+dur) rows.
  * build_scd2: run compression of a 30M-row attribute changelog.
  * edit_distance_pairs at 1M strings: wall-clock, candidate volume, max
    variant bucket (the skew observable), recall of planted near-dups.

Usage: python tools/bench_timeseries.py [n_events] [hot_factor] [n_strings]
Appends results to BENCH/TIMESERIES.md.
"""

from __future__ import annotations

import sys

from harness import append_bench, max_task_rows, timed, tool_spark, utc_stamp

BUCKET_US = 21_600_000_000  # 6 h
EVENTS_PER_USER = 60


def build_events(spark, n_events: int, hot_factor: int):
    """~n_events rows over n_events/EVENTS_PER_USER users across 30 days;
    user u0 gets hot_factor * EVENTS_PER_USER extra events. All Spark
    expressions, xxhash64-seeded, deterministic."""
    from pyspark.sql import functions as F

    n_users = n_events // EVENTS_PER_USER
    hot_extra = hot_factor * EVENTS_PER_USER
    base = spark.range(n_events).select(
        F.col("id"), (F.col("id") % n_users).alias("u")
    )
    hot = spark.range(hot_extra).select(
        (F.col("id") + n_events).alias("id"), F.lit(0).alias("u")
    )
    ev = base.unionByName(hot)
    return ev.select(
        F.col("id").alias("event_id"),
        F.col("u").alias("user_id"),
        (
            F.lit(1_700_000_000_000_000)
            + F.pmod(F.xxhash64("id", F.lit("ts")), F.lit(30 * 86_400)) * 1_000_000
        ).alias("ts_us"),
        F.pmod(F.xxhash64("id", F.lit("b")), F.lit(4_096)).alias("bytes"),
        (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(50_000)) / 100.0).alias("value"),
    )


def build_strings(spark, n_strings: int):
    """1M-scale short strings in groups of 10: one base (16 hex chars of
    md5(group id)) plus nine 1-substitution variants at DISTINCT positions.
    Expected d<=1 pairs = 9 per group (base<->each variant; variant pairs
    are distance 2), so the exact join's output is checkable in closed
    form: ~0.9 * n_strings pairs."""
    from pyspark.sql import functions as F

    ids = spark.range(n_strings)
    base = F.substring(F.md5((F.col("id") - F.pmod(F.col("id"), F.lit(10))).cast("string")), 1, 16)
    pos = (F.pmod(F.col("id"), F.lit(16)) + 1).cast("int")
    sub = F.concat(
        F.expr("substring(base_s, 1, pos - 1)"),
        F.lit("z"),  # not a hex char -> guaranteed substitution
        F.expr("substring(base_s, pos + 1, 16)"),
    )
    return (
        ids.select(F.col("id"), base.alias("base_s"), pos.alias("pos"))
        .select(
            F.col("id"),
            F.when(F.pmod("id", F.lit(10)) == 0, F.col("base_s")).otherwise(sub)
            .alias("s"),
        )
    )


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 29_700_000
    hot_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_strings = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    from flow_feature_spark.featurestore import build_scd2
    from flow_feature_spark.intervals import merge_intervals
    from flow_feature_spark.ops.fuzzy import edit_distance_pairs
    from flow_feature_spark.timeseries import decayed_counts, resample_counts

    from pyspark.sql import functions as F

    spark = tool_spark("bench_timeseries")
    ev = build_events(spark, n_events, hot_factor)
    ev.write.mode("overwrite").parquet("/dev/shm/bench_ts_events")
    stored = spark.read.parquet("/dev/shm/bench_ts_events")
    rows = stored.count()

    results: dict[str, dict] = {}

    def grid_df():
        return resample_counts(
            stored, "user_id", "ts_us", BUCKET_US,
            sum_col="bytes", ffill_col="value", tiebreak_col="event_id",
        )

    # resample: wall + grid size + fattest window task (hot-entity bound).
    # AQE's byte-based partition coalescing would fold the skinny grid into
    # one task and hide the per-key fan-out we're instrumenting — off for
    # the probe only.
    t, n_grid = timed(lambda: grid_df().count())
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    mx, ntasks = max_task_rows(grid_df())
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    results["resample_ffill"] = {
        "sec": round(t, 2), "grid_rows": n_grid,
        "max_task_rows": mx, "tasks": ntasks,
    }

    plain_grid = resample_counts(stored, "user_id", "ts_us", BUCKET_US)
    t, n_dec = timed(
        lambda: decayed_counts(
            plain_grid, "user_id", "bucket_idx", "n_events", lookback=20
        ).count()
    )
    results["decayed_counts"] = {"sec": round(t, 2), "rows": n_dec}

    iv = stored.select(
        "user_id",
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + F.floor("value").cast("long") * F.lit(1_000_000))
        .alias("end_us"),
    )
    t, n_isl = timed(
        lambda: merge_intervals(iv, "start_us", "end_us", entity_col="user_id")
        .count()
    )
    results["merge_intervals"] = {"sec": round(t, 2), "islands": n_isl}

    cl = stored.select(
        "user_id", "ts_us",
        F.floor(F.col("value") / F.lit(100)).cast("long").alias("tier"),
        "event_id",
    )
    t, n_runs = timed(
        lambda: build_scd2(cl, ["user_id"], "ts_us", ["tier"],
                           tiebreak_cols=["event_id"]).count()
    )
    results["scd2_build"] = {"sec": round(t, 2), "runs": n_runs}

    # fuzzy join at 1M strings
    strings = build_strings(spark, n_strings)
    strings.write.mode("overwrite").parquet("/dev/shm/bench_ts_strings")
    sdf = spark.read.parquet("/dev/shm/bench_ts_strings")
    from flow_feature_spark.ops.fuzzy import deletion_variants

    var = deletion_variants(sdf, "id", "s", 1)
    bucket_stats = (
        var.groupBy("variant").count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("n"))
        .collect()[0]
    )
    t, n_pairs = timed(
        lambda: edit_distance_pairs(sdf, "id", "s", max_distance=1).count()
    )
    # planted near-dups: ids ending in 9 pair with the other 9 members of
    # their group (dist 1 to base-string holders; 2 to other substituted)
    results["fuzzy_pairs_1M"] = {
        "sec": round(t, 2), "pairs": n_pairs,
        "max_variant_bucket": int(bucket_stats["mx"]),
        "distinct_variants": int(bucket_stats["n"]),
    }

    import json

    summary = json.dumps({"n_events": rows, "hot_factor": hot_factor,
                          "n_strings": n_strings, **results}, indent=2)
    print(summary)
    append_bench(
        "TIMESERIES.md",
        f"\n## {utc_stamp()} — local[32], {rows:,} events, hot x{hot_factor}, "
        f"{n_strings:,} strings\n\n```json\n{summary}\n```\n",
        title="BENCH — time-series regularization + fuzzy join at scale",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
