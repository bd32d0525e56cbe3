"""Windowed lag/lead/backfill and point-in-time cumulative features
(SURVEY.md §2.5 W2/W3/W6 — north-rule additions over the reference).

All of these are single-window, single-shuffle expressions over the same
(conv_id) hash partitioning the sessionizer uses, so Catalyst chains them
into one exchange + one sort.

The cumulative (point-in-time) per-turn feature vector is what the as-of join
attaches to probes at turn granularity: every turn row carries the statistics
of its session *up to and including that turn* — the running analog of the
reference's flow-final vector. Running std uses moment algebra
sqrt(E[x^2] - E[x]^2) over the cumulative frame (guarded at >= 0), verified
against pandas ``expanding()`` in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _key_window(conv_col: str = "conv_id") -> WindowSpec:
    return Window.partitionBy(conv_col).orderBy("ts_us", "turn_idx")


def with_lag_lead(
    df: DataFrame,
    cols: list[str],
    offsets: tuple[int, ...] = (1,),
    conv_col: str = "conv_id",
) -> DataFrame:
    """lag/lead of each column at each offset over the per-conv ordering."""
    w = _key_window(conv_col)
    for c in cols:
        for k in offsets:
            df = df.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            df = df.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return df


def forward_fill(df: DataFrame, cols: list[str], conv_col: str = "conv_id") -> DataFrame:
    """Last non-null value at or before the current turn."""
    w = _key_window(conv_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for c in cols:
        df = df.withColumn(f"{c}_ffill", F.last(c, ignorenulls=True).over(w))
    return df


def backward_fill(df: DataFrame, cols: list[str], conv_col: str = "conv_id") -> DataFrame:
    """First non-null value at or after the current turn."""
    w = _key_window(conv_col).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    for c in cols:
        df = df.withColumn(f"{c}_bfill", F.first(c, ignorenulls=True).over(w))
    return df


def rolling_turn_features(
    df: DataFrame,
    value_col: str = "plen",
    k: int = 8,
    keys: tuple[str, ...] = ("conv_id", "session_id"),
) -> DataFrame:
    """Bounded-frame rolling stats: moving count/sum/mean/min/max of
    ``value_col`` over the trailing ``k`` turns of the session (the current
    turn plus k-1 predecessors — a short-horizon behavioral signal next to
    cumulative_turn_features' full history). Point-in-time safe: the frame
    never reaches past the current row.

    Exactness discipline: the sum stays bigint over the frame and converts to
    double once for the mean (r6), matching oracle_queries.rolling_features_sql
    bit-for-bit. One window = one shuffle on ``keys``, shared with every other
    (conv_id, session_id) window in the plan.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        Window.partitionBy(*keys)
        .orderBy("ts_us", "turn_idx")
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    x = F.col(value_col)
    cnt = F.count(F.lit(1)).over(w)
    sm = F.sum(x).over(w)
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    return (
        df.withColumn("roll_cnt", cnt.cast("bigint"))
        .withColumn("roll_sum", sm.cast("bigint"))
        .withColumn("roll_mean", r6(sm.cast("double") / cnt))
        .withColumn("roll_min", F.min(x).over(w).cast("bigint"))
        .withColumn("roll_max", F.max(x).over(w).cast("bigint"))
    )


def _running_std_pop(x: Column, cum: WindowSpec) -> Column:
    mean_sq = F.avg(x * x).over(cum)
    sq_mean = F.avg(x).over(cum) * F.avg(x).over(cum)
    return F.sqrt(F.greatest(mean_sq - sq_mean, F.lit(0.0)))


def cumulative_turn_features(
    df: DataFrame,
    value_cols: tuple[str, ...] = ("plen", "win"),
    keys: tuple[str, str] = ("conv_id", "session_id"),
) -> DataFrame:
    """Per-turn running statistics within the session, point-in-time safe.

    Adds, for each value column: running count/sum/mean/min/max/std_pop over
    rows <= current turn, plus the running turn count, elapsed seconds and
    inter-turn gap. No value from any later turn leaks into a row.
    """
    order = [F.col("ts_us").asc(), F.col("turn_idx").asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    out = (
        df.withColumn("run_n_turns", F.count(F.lit(1)).over(cum))
        .withColumn(
            "run_elapsed_s",
            (F.col("ts_us") - F.first("ts_us").over(cum)) / F.lit(1e6),
        )
        .withColumn("gap_s", (F.col("ts_us") - F.lag("ts_us").over(w)) / F.lit(1e6))
    )
    for c in value_cols:
        x = F.col(c)
        out = (
            out.withColumn(f"run_{c}_sum", F.sum(x).over(cum))
            .withColumn(f"run_{c}_mean", F.avg(x).over(cum))
            .withColumn(f"run_{c}_min", F.min(x).over(cum))
            .withColumn(f"run_{c}_max", F.max(x).over(cum))
            .withColumn(f"run_{c}_std", _running_std_pop(x.cast("double"), cum))
        )
    return out
