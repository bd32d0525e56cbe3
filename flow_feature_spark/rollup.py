"""Hypertable-style multi-granularity time rollup.

One pass over the fact table emits aggregates at every granularity level
(hour, day, grand total) via Spark's native ROLLUP grouping sets — the
continuous-aggregate pattern of time-series stores, expressed declaratively
so Catalyst plans a single Expand + hash aggregate (partial + final): no
N-scans-for-N-levels, no shuffle per level.

Level identification uses the null markers ROLLUP emits: the time buckets
are derived from a non-null ts, so a null bucket can only be a subtotal row.
Counts and sums accumulate in exact integer domains (cross-engine-hash-exact
against oracle_queries.time_rollup_sql); distinct counts are exact per the
reference's dst_sets discipline (flow.py:508-510) — at 100 TB swap
count_distinct for approx_count_distinct per level, trading the driver's
exactness gate for an HLL sketch mergeable across levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    bytes_expr: str = "length(coalesce(props, ''))",
) -> DataFrame:
    """ROLLUP(day, hour) over an event table: hourly rows, daily subtotals,
    one grand total. Returns (lvl, bucket_day, bucket_hour, n_events,
    bytes_total, n_users)."""
    base = df.select(
        F.date_trunc("day", F.col(ts_col)).cast("timestamp").alias("bucket_day"),
        F.hour(F.col(ts_col)).cast("int").alias("bucket_hour"),
        F.col(entity_col).alias("__entity"),
        F.expr(bytes_expr).cast("bigint").alias("__bytes"),
    )
    agg = base.rollup("bucket_day", "bucket_hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("__bytes").cast("bigint").alias("bytes_total"),
        F.countDistinct("__entity").cast("bigint").alias("n_users"),
    )
    lvl = (
        F.when(F.col("bucket_day").isNull(), F.lit("all"))
        .when(F.col("bucket_hour").isNull(), F.lit("day"))
        .otherwise(F.lit("hour"))
    )
    return agg.select(
        lvl.alias("lvl"),
        "bucket_day",
        "bucket_hour",
        "n_events",
        "bytes_total",
        "n_users",
    )


def pivot_counts(
    df: DataFrame,
    group_col: str = "user_id",
    pivot_col: str = "event_type",
    values: list[str] | None = None,
) -> DataFrame:
    """Long->wide reshaping: one row per group, one count column per pivot
    value (the reference's per-flag counters generalized to arbitrary
    categorical columns — A8's shape as a reusable operator).

    ``values`` is required-by-convention at scale: passing it skips Spark's
    driver-side distinct scan of the pivot column, and an unexpected category
    can't silently add a column mid-pipeline (schema stability). Unlisted
    categories still count into n_total, so nothing is silently dropped.
    """
    if not values:
        raise ValueError("pivot_counts requires explicit values at scale "
                         "(implicit pivot scans the column for distincts)")
    # ONE scan, ONE shuffle, ZERO caches: with the category list explicit the
    # pivot IS just conditional aggregation, so emit one SUM(CASE) per
    # category plus the unconditional total in a single groupBy. This
    # replaces the earlier pre-aggregate+pivot+join formulation, whose
    # persisted intermediate leaked cached storage for the session lifetime
    # and whose totals join was a second shuffle.
    aggs = [
        F.sum(F.when(F.col(pivot_col) == F.lit(v), 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{v}")
        for v in values
    ]
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return df.groupBy(group_col).agg(*aggs)


def unpivot_counts(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "category",
    val_name: str = "n",
) -> DataFrame:
    """Wide->long reshaping (melt), the exact dual of ``pivot_counts``:
    one output row per (id row x value column), the column name in
    ``var_name`` and its value in ``val_name``.

    Spark's native ``unpivot`` compiles to ONE Expand node — each input row
    fans out map-side to len(value_cols) rows with zero shuffle (the same
    plan shape ROLLUP/CUBE use), so melting a 100-TB wide table is a scan,
    not a join. ``unpivot_counts(pivot_counts(df)) == groupBy counts``
    round-trip is pinned in tests and by the driver query ``melt_long``.

    Reference basis: the reference emits its 72 features as fixed wide
    columns (flow.py:193-203); long form is what drift monitors and the
    profiler consume (profile.py uses the same stack shape internally).
    """
    missing = [c for c in id_cols + value_cols if c not in df.columns]
    if missing:
        raise ValueError(f"unpivot_counts: missing columns {missing}")
    if not value_cols:
        raise ValueError("unpivot_counts requires at least one value column")
    return df.unpivot(id_cols, value_cols, var_name, val_name)


def hopping_window_counts(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    bytes_expr: str = "length(coalesce(props, ''))",
    size: str = "6 hours",
    slide: str = "2 hours",
    exact_distinct: bool = True,
) -> DataFrame:
    """Hopping (sliding) window aggregates: one row per slide-aligned window
    of length ``size`` — the overlapping-window twin of ``time_rollup``'s
    disjoint buckets (each event lands in exactly size/slide windows when
    slide divides size, all epoch-grid-aligned). Native ``F.window``: the
    explode-to-windows step happens inside Catalyst's TimeWindow expansion,
    one shuffle on the window key. Window bounds are emitted as exact bigint
    microseconds (cross-engine hash-stable; the DuckDB oracle reproduces the
    grid with pure integer arithmetic).

    ``exact_distinct=False``: HLL sketch per window instead of exact
    COUNT(DISTINCT) — at 10^12 rows each event is replicated size/slide
    times, so the exact distinct's dedup shuffle multiplies with the
    replication factor; the sketch keeps the replicated agg map-side
    partial. Driver query stays exact."""
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    w = F.window(F.col(ts_col).cast("timestamp"), size, slide)
    return (
        df.groupBy(w.alias("w"), )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            distinct(F.col(entity_col)).cast("bigint").alias("n_users"),
            F.sum(F.expr(bytes_expr).cast("bigint")).cast("bigint").alias(
                "bytes_total"
            ),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            F.unix_micros(F.col("w.end")).alias("win_end_us"),
            "n_events",
            "n_users",
            "bytes_total",
        )
    )
