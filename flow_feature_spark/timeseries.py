"""Regular-grid resampling (gap fill + forward fill) and exponential
half-life decayed counts over irregular event streams.

Feature pipelines constantly need *regularized* time series: the raw
transcript/event stream is irregular, but models consume fixed-cadence
features ("events in each 6-hour bucket", "decayed activity count at each
bucket"). The reference computes per-flow aggregates over whatever packets
arrived (flow.py:129-203); these operators are the fixed-cadence duals a
training pipeline builds on top.

``resample_counts`` densifies: one hash aggregate to per-(entity, bucket)
partials, one per-entity min/max aggregate whose ``sequence()`` explode
generates the dense bucket grid (an entity's grid lives in one task — rows
per entity = its active span / bucket, not the global span), one
co-partitioned left join to attach the partials, and one per-entity window
for forward-fill. Empty buckets appear with zeroed counts and carry the
last observed value forward — exactly the shape ``decayed_counts`` needs.

``decayed_counts`` computes, at every bucket ``b`` of a DENSE grid, the
half-life-decayed event count ``sum_{j=0..K} c_{b-j} * 2^-j`` (half-life =
one bucket, lookback truncated at K buckets where the weight is 2^-K).
Exactness: the sum is evaluated as the INTEGER ``sum_j c_{b-j} * 2^(K-j)``
(K+1 lag terms over one per-entity window = one exchange, all JVM
shiftleft/sum codegen), then divided by 2^K in ONE double operation. For
``num < 2^53`` the quotient is a dyadic rational represented exactly, so
the double output is bit-identical cross-engine — no transcendental
``exp(-lambda t)`` is ever evaluated (transcendentals are not cross-engine
bit-stable; a power-of-two half-life needs none). A loud overflow wall
rejects per-bucket counts >= 2^(62-K) instead of silently wrapping.

Scale shape: both operators shuffle on (entity) or (entity, bucket) only;
grids are per-entity so a 100-TB table with bounded per-entity spans never
materializes a global calendar; the decayed window is K+1 lags over the
same sort the grid join already produced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_counts(
    df: DataFrame,
    entity_col: str,
    ts_us_col: str,
    bucket_us: int,
    sum_col: str | None = None,
    ffill_col: str | None = None,
    tiebreak_col: str | None = None,
    max_gap_buckets: int = 10_000_000,
) -> DataFrame:
    """Dense per-entity bucket grid with zero-filled counts/sums and a
    forward-filled "last observed value" column.

    Output: (entity, bucket_idx, bucket_start_us, n_events, sum_<sum_col>,
    <ffill_col>_ffill). ``bucket_idx = floor(ts_us / bucket_us)`` — grid
    cells are absolute-time-aligned, so two entities' buckets line up.
    The forward-filled value is the ``ffill_col`` of the latest event at
    or before the bucket end (ties on ts broken by ``tiebreak_col``
    descending-last, i.e. max_by over (ts, tiebreak)); buckets before the
    entity's first event cannot occur (grid starts at its min bucket).

    ``max_gap_buckets`` is a loud explode-budget wall (mirrors
    ``rangejoin``'s): one event pair spanning years at a small ``bucket_us``
    would make a single post-shuffle row generate span/bucket grid cells
    that AQE cannot split. Rather than silently producing a skewed
    multi-million-row explode, the job fails with a message naming the gap
    and suggesting a coarser bucket.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    if max_gap_buckets < 1:
        raise ValueError("max_gap_buckets must be >= 1")
    for reserved in ("entity", "bucket_idx"):
        if reserved in df.columns and reserved != entity_col:
            raise ValueError(f"resample_counts: input column {reserved!r} clashes "
                             "with an internal name; rename it first")
    e, t = F.col(entity_col), F.col(ts_us_col)
    b = F.floor(t / F.lit(int(bucket_us))).cast("long").alias("bucket_idx")

    aggs = [F.count(F.lit(1)).alias("n_events")]
    if sum_col is not None:
        aggs.append(F.coalesce(F.sum(sum_col), F.lit(0)).alias(f"sum_{sum_col}"))
    if ffill_col is not None:
        order = F.struct(
            t, *( [F.col(tiebreak_col)] if tiebreak_col else [] )
        )
        aggs.append(F.max_by(ffill_col, order).alias("_bucket_last"))
    # ONE scan of the raw table: the (entity, bucket) partials shuffle on
    # (entity, bucket) — the compressed rows, never the raw events. The dense
    # grid is then generated WITHOUT a span join or second scan: each
    # per-bucket row explodes the gap back to its lag (the classic
    # sessionized gap-fill), so the grid appears inline in one branch. The
    # lag/ffill windows share one hash(entity) exchange — the partitioning
    # this operator inherently needs, since forward fill is a per-entity
    # sequential pass; a hot entity's grid is bounded by its active span /
    # bucket, never by its event count.
    others = [F.col(c) for c in df.columns if c != entity_col]
    per_bucket = df.select(e.alias("entity"), b, *others).groupBy(
        "entity", "bucket_idx"
    ).agg(*aggs)

    wlag = Window.partitionBy("entity").orderBy("bucket_idx")
    gapped = per_bucket.withColumn(
        "_from",
        F.coalesce(F.lag("bucket_idx").over(wlag) + 1, F.col("bucket_idx")),
    )
    real = F.col("_g") == F.col("bucket_idx")
    gen_cols = [
        F.col("entity"),
        F.col("_g").alias("_grid_idx"),
        F.when(real, F.col("n_events")).otherwise(F.lit(0)).alias("n_events"),
    ]
    if sum_col is not None:
        gen_cols.append(
            F.when(real, F.col(f"sum_{sum_col}")).otherwise(F.lit(0))
            .alias(f"sum_{sum_col}")
        )
    if ffill_col is not None:
        gen_cols.append(
            F.when(real, F.col("_bucket_last")).alias("_bucket_last")
        )
    gap_guard = F.when(
        F.col("bucket_idx") - F.col("_from") < F.lit(int(max_gap_buckets)),
        F.sequence("_from", "bucket_idx"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("resample_counts: one gap would generate "),
                (F.col("bucket_idx") - F.col("_from") + 1).cast("string"),
                F.lit(
                    f" grid cells > max_gap_buckets={max_gap_buckets}; "
                    f"use a coarser bucket_us (current {bucket_us} us) or "
                    "raise max_gap_buckets"
                ),
            )
        ).cast("array<bigint>")
    )
    out = gapped.select(
        "*", F.explode(gap_guard).alias("_g")
    ).select(*gen_cols).withColumnRenamed("_grid_idx", "bucket_idx")
    if ffill_col is not None:
        w = (
            Window.partitionBy("entity")
            .orderBy("bucket_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            f"{ffill_col}_ffill", F.last("_bucket_last", ignorenulls=True).over(w)
        ).drop("_bucket_last")
    out = out.withColumn(
        "bucket_start_us", (F.col("bucket_idx") * F.lit(int(bucket_us))).cast("long")
    )
    cols = ["entity", "bucket_idx", "bucket_start_us", "n_events"]
    if sum_col is not None:
        cols.append(f"sum_{sum_col}")
    if ffill_col is not None:
        cols.append(f"{ffill_col}_ffill")
    return out.select(*cols).withColumnRenamed("entity", entity_col)


def decayed_counts(
    grid: DataFrame,
    entity_col: str,
    bucket_col: str,
    count_col: str,
    lookback: int = 20,
) -> DataFrame:
    """Half-life-decayed count at every bucket of a DENSE grid (one row per
    consecutive bucket per entity — ``resample_counts`` output).

    Adds ``decayed_num`` (exact integer ``sum_j c_{b-j} * 2^(lookback-j)``,
    j = 0..lookback) and ``decayed`` (that numerator / 2^lookback in one
    double divide — exact while the numerator stays below 2^53; the bigint
    numerator itself is always exact and is what the driver hashes).

    The grid MUST be dense: lag(j) is "j buckets ago" only when every
    bucket exists. This is a deliberate contract, not a limitation — decay
    over missing buckets must still decay, which is precisely what the
    zero-filled grid encodes.
    """
    if not 0 < lookback <= 61:
        raise ValueError("lookback must be in 1..61 (2^lookback weight must fit)")
    w = Window.partitionBy(entity_col).orderBy(bucket_col)
    c = F.col(count_col).cast("long")
    # loud overflow wall: a single bucket's weighted term must fit in int64
    cap = 1 << (62 - lookback)
    guarded = F.when(
        c >= F.lit(cap),
        F.raise_error(
            F.concat(
                F.lit(f"decayed_counts: per-bucket count >= 2^{62 - lookback} "
                      "overflows the exact 2^(K-j) weighting; reduce lookback "
                      "or pre-scale counts (count was "),
                c.cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(c)
    terms = [
        F.shiftleft(F.coalesce(F.lag(guarded, j).over(w), F.lit(0)), lookback - j)
        for j in range(lookback + 1)
    ]
    num = terms[0]
    for t in terms[1:]:
        num = num + t
    den = float(1 << lookback)
    return grid.withColumn("decayed_num", num.cast("long")).withColumn(
        "decayed", F.col("decayed_num").cast("double") / F.lit(den)
    )
