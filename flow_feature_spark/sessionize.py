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


def _reset_cond_col(reset_tool: str | None) -> "F.Column":
    """tool-flag force-new predicate (False literal when no reset tool)."""
    if reset_tool is None:
        return F.lit(False)
    from flow_feature_spark.schema import TOOL_FLAG_BITS

    bit = TOOL_FLAG_BITS[reset_tool]
    return F.shiftright(F.col("flags"), bit).bitwiseAND(1) == 1


def assign_sessions_bucketed(
    df: DataFrame,
    gap_seconds: float = DEFAULT_SESSION_GAP_S,
    bucket_turns: int = 8192,
    conv_col: str = "conv_id",
    ts_us_col: str = "ts_us",
    tiebreak_col: str = "turn_idx",
    out_col: str = "session_id",
    reset_tool: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``assign_sessions`` with NO per-conversation single task: identical
    session ids, but every window is scoped to a contiguous turn-range bucket
    of at most ``bucket_turns`` rows, so a 10^7-turn mega-conversation spreads
    over 10^7/bucket_turns tasks instead of serializing its sort + lag +
    cumsum through one (the last per-conv straggler VERDICT r2 named).

    Two-pass design (the salted.py turn-range-bucket + boundary-carry shape,
    applied to session ASSIGNMENT itself):

    1. bucket = floor(turn_idx / bucket_turns) — pure arithmetic, no pre-pass
       window; explicit repartition(conv, bucket) (a window's
       ClusteredDistribution is satisfied by the upstream conv-only hash
       partitioning — a key subset — so without the explicit exchange every
       bucket of a hot conv would stay in ONE task). Within-bucket lag gives
       each non-first row its exact global gap.
    2. A per-(conv, bucket) summary (first/last ts, local new-session count,
       first-row reset flag) — ~n/bucket_turns tiny rows — is windowed per
       conv (bounded at max_conv_turns/bucket_turns rows per task) to decide
       each bucket's boundary flag and its session-id offset (prefix sum of
       earlier buckets' new-session counts), then joined back on
       (conv, bucket): the join reuses the pass-1 partitioning AND sort order
       (conv, bucket prefix), so the big side never re-shuffles.

    session_id = offset + within-bucket cumulative sum of new-session flags —
    hash-identical to ``assign_sessions`` (asserted in tests and shared with
    its DuckDB oracle via the sessionize_bucketed driver query).

    Reference basis: the reference's per-flow sort + single-pass walk
    (flow.py:139, flow_basic.py:70-76) assumes a whole flow fits one worker;
    this is that walk re-derived as a two-level scan so no single task ever
    owns a whole key — the north rule's explicit-skew-handling requirement.

    Precondition (same contract as salted.py:23-27, checked by
    ``precondition_violations``): within a conversation ts is non-decreasing
    in turn_idx, so contiguous turn_idx ranges are contiguous time ranges and
    the (ts, turn_idx) sort order equals the turn_idx order. Inputs that
    violate it must route through ``assign_sessions`` (adaptive_session_features
    does this automatically).
    """
    gap_us = int(round(gap_seconds * 1_000_000))
    tool_new = _reset_cond_col(reset_tool)

    t = df.withColumn(
        "__bkt", F.floor(F.col(tiebreak_col).cast("long") / F.lit(bucket_turns))
    )
    t = (
        t.repartition(num_partitions, conv_col, "__bkt")
        if num_partitions
        else t.repartition(conv_col, "__bkt")
    )
    wb = Window.partitionBy(conv_col, "__bkt").orderBy(ts_us_col, tiebreak_col)
    t = t.withColumn("__lgap", F.col(ts_us_col) - F.lag(ts_us_col, 1).over(wb))
    t = t.withColumn("__tool_new", tool_new.cast("int"))
    # new-session flag for rows WITH a within-bucket predecessor (bucket-first
    # rows are decided by the summary's boundary gap below)
    t = t.withColumn(
        "__local_new",
        F.when(
            F.col("__lgap").isNotNull(),
            ((F.col("__lgap") > F.lit(gap_us)) | (F.col("__tool_new") == 1)).cast("long"),
        ),
    )

    summary = t.groupBy(conv_col, "__bkt").agg(
        F.min(ts_us_col).alias("__first_us"),
        F.max(ts_us_col).alias("__last_us"),
        F.coalesce(F.sum("__local_new"), F.lit(0)).alias("__local_cnt"),
        F.min_by("__tool_new", F.struct(ts_us_col, tiebreak_col)).alias("__first_tool"),
    )
    ws = Window.partitionBy(conv_col).orderBy("__bkt")
    prev_last = F.lag("__last_us", 1).over(ws)
    first_new = F.when(
        prev_last.isNull()
        | ((F.col("__first_us") - prev_last) > F.lit(gap_us))
        | (F.col("__first_tool") == 1),
        F.lit(1),
    ).otherwise(F.lit(0))
    summary = summary.withColumn("__first_new", first_new.cast("long"))
    w_off = Window.partitionBy(conv_col).orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    summary = summary.withColumn(
        "__offset",
        F.coalesce(
            F.sum(F.col("__local_cnt") + F.col("__first_new")).over(w_off), F.lit(0)
        ),
    ).select(conv_col, "__bkt", "__first_new", "__offset")

    joined = t.join(summary, [conv_col, "__bkt"])
    is_new = F.when(F.col("__lgap").isNull(), F.col("__first_new")).otherwise(
        F.col("__local_new")
    )
    cum = Window.partitionBy(conv_col, "__bkt").orderBy(
        ts_us_col, tiebreak_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = joined.withColumn(
        out_col, (F.col("__offset") + F.sum(is_new).over(cum)).cast("long")
    )
    return out.drop(
        "__bkt", "__lgap", "__tool_new", "__local_new", "__first_new", "__offset"
    )


def precondition_violations(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_us_col: str = "ts_us",
    turn_col: str = "turn_idx",
    bucket_turns: int = 8192,
) -> DataFrame:
    """conv_ids where ts DECREASES along turn_idx — the inputs the bucketized
    paths (assign_sessions_bucketed, salted.py) must not receive.

    Skew-safe by the same construction as the sessionizer: within-bucket lag
    over (conv, bucket) windows bounded at ``bucket_turns`` rows, plus a
    tiny per-conv summary pass for cross-bucket boundaries (comparing each
    bucket's ts-at-max-turn against the next bucket's ts-at-min-turn).
    Returns a one-column DataFrame of distinct offending conv_ids — route
    these through the order-agnostic grouped kernel.
    """
    t = df.select(
        conv_col, ts_us_col, turn_col,
        F.floor(F.col(turn_col).cast("long") / F.lit(bucket_turns)).alias("__bkt"),
    ).repartition(conv_col, "__bkt")
    wb = Window.partitionBy(conv_col, "__bkt").orderBy(turn_col)
    local_bad = (F.col(ts_us_col) < F.lag(ts_us_col, 1).over(wb)).cast("int")
    summary = (
        t.withColumn("__bad", local_bad)
        .groupBy(conv_col, "__bkt")
        .agg(
            F.coalesce(F.sum("__bad"), F.lit(0)).alias("__bad_cnt"),
            F.min_by(ts_us_col, F.col(turn_col)).alias("__ts_first"),
            F.max_by(ts_us_col, F.col(turn_col)).alias("__ts_last"),
        )
    )
    ws = Window.partitionBy(conv_col).orderBy("__bkt")
    boundary_bad = (
        F.col("__ts_first") < F.lag("__ts_last", 1).over(ws)
    ).cast("int")
    per_conv = (
        summary.withColumn("__bbad", F.coalesce(boundary_bad, F.lit(0)))
        .groupBy(conv_col)
        .agg(F.sum(F.col("__bad_cnt") + F.col("__bbad")).alias("__viol"))
    )
    return per_conv.filter(F.col("__viol") > 0).select(conv_col)


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
