"""Interval coalescing (gaps-and-islands merge): collapse a set of
possibly-overlapping [start, end] intervals into maximal covered islands.

The classic use in this pipeline: event/session activity intervals per
user merged into "coverage windows" (when was the user continuously
active), or globally into "when was ANY session running". The reference
has the degenerate per-flow form of this — a flow's [start_time, end_time]
envelope (flow_basic.py:53-62 tracks running min/max); island merge is the
n-interval generalization a transcript pipeline needs.

Semantics: closed-interval merge — two intervals belong to one island when
``next.start <= running_max(end)`` of everything before it in start order
(touching endpoints merge). Each island reports its span, its interval
count, and the exact sum of member lengths (int64 microseconds throughout).

Scale shape:
- Per-entity (``entity_col`` given): ONE hash exchange on entity; island
  detection is a running-max + running-sum window over (start, end), then
  a hash aggregate on (entity, island). Entities merge in parallel.
- Global (``entity_col=None``): islands of a 100-TB interval set cannot be
  a single-partition window over raw intervals. Two-level formulation:
  intervals are bucketed by fixed-width start-time ranges (data-independent
  => deterministic), merged WITHIN each bucket in parallel, and the
  resulting per-bucket islands — at most a few per bucket in realistic
  streams, and always <= interval count — are merged again by the same
  rule on one small final partition. Correct because merging preserves
  coverage (merge(merge(A) U merge(B)) = merge(A U B)) and the carried
  (count, length-sum) aggregates are associative. Equality of the two
  paths is pinned by a randomized test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_AGG_COLS = ("start_us", "end_us", "n_intervals", "len_sum_us")


def _islands(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """Merge intervals within each ``part_cols`` partition. Input columns:
    start_us, end_us, n_intervals, len_sum_us (pre-aggregated carries)."""
    w = Window.partitionBy(*part_cols).orderBy("start_us", "end_us")
    prev_max = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max.isNull() | (F.col("start_us") > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("island_id", island.cast("long"))
        .groupBy(*part_cols, "island_id")
        .agg(
            F.min("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
            F.sum("n_intervals").alias("n_intervals"),
            F.sum("len_sum_us").alias("len_sum_us"),
        )
    )


def merge_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    entity_col: str | None = None,
    global_bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Coalesce intervals into islands.

    Returns (entity?, island_id, start_us, end_us, n_intervals,
    len_sum_us) with island_id numbered 1..k in start order within each
    entity (or globally). Rows with NULL or inverted bounds are rejected
    loudly — silent drops would undercount coverage.
    """
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    bad = F.when(
        s.isNull() | e.isNull() | (e < s),
        F.raise_error(F.lit(
            "merge_intervals: NULL or inverted interval bounds; clean the "
            "input explicitly (silent drops would undercount coverage)"
        )).cast("long"),
    ).otherwise(s)
    base = df.select(
        *( [F.col(entity_col).alias("entity")] if entity_col else [] ),
        bad.alias("start_us"),
        e.alias("end_us"),
        F.lit(1).cast("long").alias("n_intervals"),
        (e - s).alias("len_sum_us"),
    )
    if entity_col is not None:
        out = _islands(base, ["entity"])
        return out.withColumnRenamed("entity", entity_col)

    # global: fixed-width start buckets -> parallel intra-bucket merge ->
    # final merge of the (small) island list; island ids renumbered there.
    if global_bucket_us <= 0:
        raise ValueError("global_bucket_us must be positive")
    bucketed = base.withColumn(
        "_bkt", F.floor(F.col("start_us") / F.lit(int(global_bucket_us)))
    )
    partial = _islands(bucketed, ["_bkt"]).drop("island_id")
    return _islands(partial.withColumn("_one", F.lit(1)), ["_one"]).drop("_one")
