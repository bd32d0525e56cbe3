"""Gap-based sessionization and idempotent turn dedup (SURVEY.md §2.5 W4/W5).

The reference separates "sessions" only by flow identity plus a SYN-reset hint
(flow_basic.py:70-72); the north rule generalizes that to gap-based
sessionization: a new session starts whenever the inter-turn gap exceeds a
threshold. Canonical Spark idiom: ``lag`` + cumulative sum over a per-key
window — one shuffle on conv_id, reused by every downstream per-session
aggregate (same partitioning, no second exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SESSION_GAP_S = 1800.0  # 30 minutes


def assign_sessions(
    df: DataFrame,
    gap_seconds: float = DEFAULT_SESSION_GAP_S,
    conv_col: str = "conv_id",
    ts_us_col: str = "ts_us",
    tiebreak_col: str = "turn_idx",
    out_col: str = "session_id",
    reset_tool: str | None = None,
) -> DataFrame:
    """Add a 1-based ``session_id`` per conv: gap > threshold => new session.

    Gap comparison runs in exact integer microseconds (no float drift at the
    threshold boundary). Ordering is (ts, turn_idx) — the stable secondary
    sort the reference gets implicitly from Python's stable list sort
    (flow.py:139).

    ``reset_tool``: a tool name whose turns force-open a new session — the
    transcript analog of the reference's SYN start_time reset
    (flow_basic.py:70-72, its only sessionization-flavored logic).
    """
    gap_us = int(round(gap_seconds * 1_000_000))
    w = Window.partitionBy(conv_col).orderBy(ts_us_col, tiebreak_col)
    gap = F.col(ts_us_col) - F.lag(ts_us_col, 1).over(w)
    new_cond = gap.isNull() | (gap > F.lit(gap_us))
    if reset_tool is not None:
        # normalized turns carry the tool as a flag bitmask (prepare.py)
        from flow_feature_spark.schema import TOOL_FLAG_BITS

        bit = TOOL_FLAG_BITS[reset_tool]
        new_cond = new_cond | (F.shiftright(F.col("flags"), bit).bitwiseAND(1) == 1)
    is_new = F.when(new_cond, F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy(conv_col).orderBy(ts_us_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(is_new).over(cum).cast("long"))


def dedup_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop duplicate (conv_id, turn_idx) rows, keeping the earliest-ts one.

    Used for idempotent resume: re-ingested turns after a restart collapse to
    one row (SURVEY.md §2.5 W5).
    """
    w = Window.partitionBy(conv_col, turn_col).orderBy(F.col(ts_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
