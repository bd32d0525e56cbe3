"""Interval (range) join: probes x intervals containment, time-bucketized.

Spark has no native interval/range join. The naive formulation

    probes JOIN intervals ON ts BETWEEN start AND end

plans as BroadcastNestedLoopJoin (a cartesian scan) when no equi key exists,
and even with an entity equi key a hot entity degenerates to per-key
quadratic work inside one task. The scale path is the classic time-bucket
decomposition (the same grid trick Flink's interval join and spatial grid
joins use): pick a bucket width W, explode each interval into every bucket it
overlaps, map each probe to its single bucket floor(ts/W), equi-join on
(entity..., bucket), then re-check exact containment. Each matching
(probe, interval) pair is emitted exactly once because a probe lives in
exactly one bucket — no post-join dedup. The join is a plain shuffled hash
join on (entity, bucket): partitionable, AQE-skew-splittable, broadcastable
when one side is small.

Sizing: cost = sum over intervals of span/W explode rows. Pick W near the
median interval span so typical intervals land in 1-2 buckets. Intervals
longer than ``max_interval_buckets * W`` raise rather than silently explode
(no silent caps); raise ``bucket_us`` for long-interval workloads.

Reference basis: flow.py:98-127 groups packets into flows by key only; the
north rule's entity x timestamp probe model generalizes it to time-interval
containment, the dual of the as-of join (asof.py): as-of attaches the latest
*point* at or before the probe, this attaches every *interval* covering it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_US = 3_600_000_000  # 1 h


def interval_join_bucketed(
    intervals: DataFrame,
    probes: DataFrame,
    *,
    entity_cols: tuple[str, ...] = ("entity_id",),
    start_col: str = "start_us",
    end_col: str = "end_us",
    probe_ts_col: str = "ts_us",
    bucket_us: int = DEFAULT_BUCKET_US,
    max_interval_buckets: int = 4096,
) -> DataFrame:
    """Inner-join probes to every interval containing them (inclusive ends).

    ``intervals`` carries entity_cols + [start_col, end_col] (bigint µs) +
    payload columns; ``probes`` carries entity_cols + probe_ts_col (bigint µs)
    + its own columns. Payload/probe column names must not collide (entity
    cols are the shared join key). ``entity_cols=()`` gives the pure range
    join — every probe against every interval, still bucket-decomposed, never
    a cartesian plan.

    Malformed intervals (null or end < start) match nothing and are dropped,
    mirroring the SQL BETWEEN semantics of the oracle.
    """
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    s, e = F.col(start_col), F.col(end_col)
    iv = intervals.filter(s.isNotNull() & e.isNotNull() & (e >= s))
    lo_b = F.floor(s / F.lit(bucket_us))
    hi_b = F.floor(e / F.lit(bucket_us))
    # loud wall, not a silent cap: an interval spanning more buckets than the
    # explode budget means bucket_us is mis-sized for this workload
    span_guard = F.when(
        hi_b - lo_b < max_interval_buckets, F.sequence(lo_b, hi_b)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval spans "),
                (hi_b - lo_b + 1).cast("string"),
                F.lit(
                    f" buckets > max_interval_buckets={max_interval_buckets}; "
                    f"raise bucket_us (current {bucket_us} us)"
                ),
            )
        ).cast("array<bigint>")
    )
    iv = iv.withColumn("__bucket", F.explode(span_guard))
    pr = probes.withColumn(
        "__bucket", F.floor(F.col(probe_ts_col) / F.lit(bucket_us))
    )
    keys = [*entity_cols, "__bucket"]
    t = F.col(probe_ts_col)
    out = pr.join(iv, on=keys, how="inner").filter((t >= s) & (t <= e))
    return out.drop("__bucket")


def interval_join_naive(
    intervals: DataFrame,
    probes: DataFrame,
    *,
    entity_cols: tuple[str, ...] = ("entity_id",),
    start_col: str = "start_us",
    end_col: str = "end_us",
    probe_ts_col: str = "ts_us",
) -> DataFrame:
    """Direct non-equi formulation — the in-repo cross-check oracle. With
    entity_cols it is an equi join with a range post-filter (fine at modest
    per-entity cardinality); without, Spark plans a nested-loop join — test
    scale only, never the production path."""
    t, s, e = F.col(probe_ts_col), F.col(start_col), F.col(end_col)
    cond = (t >= s) & (t <= e)
    for k in entity_cols:
        cond = (probes[k] == intervals[k]) & cond
    out = probes.join(intervals, on=cond, how="inner")
    for k in entity_cols:
        out = out.drop(intervals[k])
    return out


def overlap_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    entity_cols: tuple[str, ...] = (),
    left_start: str = "l_start_us",
    left_end: str = "l_end_us",
    right_start: str = "r_start_us",
    right_end: str = "r_end_us",
    bucket_us: int = DEFAULT_BUCKET_US,
    max_interval_buckets: int = 4096,
) -> DataFrame:
    """Interval x interval OVERLAP join: every (left, right) pair whose
    [start, end] ranges intersect (inclusive ends) — e.g. which sessions ran
    concurrently. Both sides explode into time buckets and equi-join on
    (entity..., bucket); a pair sharing several buckets is emitted exactly
    once via the responsibility rule: only the bucket containing the
    overlap's LEFT EDGE (max of the two starts) emits the pair. Column names
    must not collide across sides (rename before calling).
    """
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")

    def _explode(df: DataFrame, s_col: str, e_col: str) -> DataFrame:
        s, e = F.col(s_col), F.col(e_col)
        df = df.filter(s.isNotNull() & e.isNotNull() & (e >= s))
        lo_b, hi_b = F.floor(s / F.lit(bucket_us)), F.floor(e / F.lit(bucket_us))
        seq = F.when(
            hi_b - lo_b < max_interval_buckets, F.sequence(lo_b, hi_b)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("interval spans "),
                    (hi_b - lo_b + 1).cast("string"),
                    F.lit(
                        f" buckets > max_interval_buckets={max_interval_buckets}; "
                        f"raise bucket_us (current {bucket_us} us)"
                    ),
                )
            ).cast("array<bigint>")
        )
        return df.withColumn("__bucket", F.explode(seq))

    li = _explode(left, left_start, left_end)
    ri = _explode(right, right_start, right_end)
    keys = [*entity_cols, "__bucket"]
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    overlap = (ls <= re_) & (rs <= le)
    responsible = F.floor(F.greatest(ls, rs) / F.lit(bucket_us)) == F.col("__bucket")
    return li.join(ri, on=keys, how="inner").filter(overlap & responsible).drop("__bucket")
