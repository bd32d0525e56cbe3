"""Behavioral analytics over event/transcript tables: ordered funnels,
cohort retention, Markov transition matrices, and histogram drift.

All four are single-logical-scan, windowed formulations chosen for the
100-TB shape, and all are exactly reproducible in ANSI SQL (DuckDB oracles
in oracle_queries.py — driver queries ``funnel_steps``, ``cohort_retention``,
``transition_matrix``, ``histogram_drift``).

Funnel: the classic k-step ordered-sequence reach ("did the user view, then
later click, then later purchase"). Each step's first-qualifying timestamp
is a full-partition window min over an expression referencing the PREVIOUS
step's window min — k chained Window operators over the SAME (user) ordering,
so Catalyst plans ONE exchange for the whole chain, never a join per step
(the join-per-step formulation shuffles k times; this shuffles once).
Strictly-after semantics: step i+1 counts only at ts strictly greater than
step i's first-qualifying ts.

Retention: cohort = the user's first active day; a (cohort_day, day_offset)
cell counts the distinct users of that cohort active offset days later.
first-day is again a full-partition window min, then one hash aggregate on
(cohort_day, offset) — two shuffles total, both on low-cardinality keys at
the aggregate side.

Reference basis: generalizes the reference's per-flow firsts/counters
(flow.py:129-203 computes per-group firsts and conditioned counts; these are
the same shapes keyed by user across sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_step_gap_seconds: float | None = None,
) -> DataFrame:
    """(step_idx, step, n_users, conv_rate) — users reaching each ordered
    step; conv_rate = reach / step-1 reach, r6-rounded. ``steps`` must be
    non-empty; a user reaches step i+1 only via an event strictly after
    their step-i first-qualifying event, and (with ``max_step_gap_seconds``)
    no later than that many seconds after it.

    Anchoring semantics: GREEDY FIRST-ANCHOR. Each step anchors on the
    user's FIRST qualifying event only — with ``max_step_gap_seconds`` set,
    a funnel completed via a later re-entry (the first view's window
    expires, a second view converts) is NOT counted, an undercount relative
    to re-anchoring funnel definitions some product-analytics tools use.
    This single-anchor form is what one window-min chain per step can
    express in one exchange; ``funnel_reanchored`` below is the
    any-anchor variant (conversion-window semantics, k−1 forward-as-of
    passes) that counts those re-entries. Engine and SQL oracle agree
    exactly (test_funnel_uses_earliest_qualifying_not_any pins this)."""
    if not steps:
        raise ValueError("funnel_counts requires at least one step")
    gap_us = (
        int(round(max_step_gap_seconds * 1_000_000))
        if max_step_gap_seconds is not None
        else None
    )
    w = Window.partitionBy("__user").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    df = events.select(
        F.col(user_col).alias("__user"),
        F.col(type_col).alias("__type"),
        ts_us.alias("__ts_us"),
    )
    prev = None
    for i, step in enumerate(steps):
        qualifies = F.col("__type") == F.lit(step)
        if prev is not None:
            qualifies = qualifies & (F.col("__ts_us") > F.col(prev))
            if gap_us is not None:
                qualifies = qualifies & (
                    F.col("__ts_us") <= F.col(prev) + F.lit(gap_us)
                )
        col = f"__t{i}"
        df = df.withColumn(col, F.min(F.when(qualifies, F.col("__ts_us"))).over(w))
        prev = col
    per_user = df.groupBy("__user").agg(
        *[F.max(f"__t{i}").alias(f"t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(F.when(F.col(f"t{i}").isNotNull(), F.lit(1)))
            .cast("bigint")
            .alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    return _funnel_output(counts, steps)


def _funnel_output(counts: DataFrame, steps: list[str]) -> DataFrame:
    """Explode a single-row (n0..n{k-1}) frame into the funnel output shape
    (step_idx, step, n_users, conv_rate); conv_rate r6-rounded."""
    rows = []
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    for i, step in enumerate(steps):
        rate = (
            F.lit(1.0)
            if i == 0
            else r6(
                F.col(f"n{i}").cast("double")
                / F.greatest(F.col(f"n{i-1}"), F.lit(1)).cast("double")
            )
        )
        rows.append(
            F.struct(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"n{i}").alias("n_users"),
                rate.cast("double").alias("conv_rate"),
            )
        )
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users", "r.conv_rate"
    )


def funnel_reanchored(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    conversion_window_seconds: float | None = 86400.0,
) -> DataFrame:
    """Re-anchoring (any-anchor) funnel: same output shape as
    ``funnel_counts``, but a user reaches step i if a chain of
    strictly-increasing step events completes from ANY of their step-0
    events within ``conversion_window_seconds`` of that anchor — the
    re-entry case ``funnel_counts`` undercounts (first view's window
    expires, a second view converts) is counted here.

    Exactness: with a common per-anchor deadline the earliest-next-event
    (greedy) chain dominates — if any chain from an anchor completes, the
    greedy one does (induction: greedy t_i <= any valid x_i, and the
    deadline is shared). So evaluating only the greedy chain per anchor is
    exact. NOTE this dominance does NOT hold for per-step gaps (a later,
    slower step-2 extends step-3's gap budget), which is why this variant
    uses a conversion window and ``funnel_counts`` keeps per-step gaps.

    Shape: k-1 forward-as-of passes, each ONE union + window min
    (PARTITION BY user ORDER BY ts, probe-after-event tie order, frame
    [current, unbounded following]) — the asof_union_window formulation
    (asof.py) applied per funnel step. Each pass shuffles (surviving
    anchors + step-i events); frames shrink monotonically as anchors die.
    Skew surface: a hot user's anchors and events share one partition,
    the same surface as ``funnel_counts`` (BENCH/SEQUENCE_SCALE.md)."""
    if not steps:
        raise ValueError("funnel_reanchored requires at least one step")
    win_us = (
        int(round(conversion_window_seconds * 1_000_000))
        if conversion_window_seconds is not None
        else None
    )
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("__user"),
        F.col(type_col).alias("__type"),
        ts_us.alias("__ts_us"),
    )
    # survivors_i: one row per still-alive anchor (user, anchor ts, chain ts)
    survivors = ev.filter(F.col("__type") == F.lit(steps[0])).select(
        "__user",
        F.col("__ts_us").alias("__a"),
        F.col("__ts_us").alias("__cur"),
    )
    reach = [survivors.select("__user", F.lit(0).alias("__step"))]
    w = (
        Window.partitionBy("__user")
        .orderBy("__ord", "__tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    for i, step in enumerate(steps[1:], start=1):
        probes = survivors.select(
            "__user",
            F.col("__cur").alias("__ord"),
            "__a",
            F.lit(None).cast("long").alias("__ev"),
            F.lit(1).alias("__tag"),
        )
        step_ev = ev.filter(F.col("__type") == F.lit(step)).select(
            "__user",
            F.col("__ts_us").alias("__ord"),
            F.lit(None).cast("long").alias("__a"),
            F.col("__ts_us").alias("__ev"),
            F.lit(0).alias("__tag"),
        )
        # events at the probe's exact ts sort BEFORE it (__tag 0 < 1), so the
        # forward frame sees only strictly-later step events
        nxt = F.min("__ev").over(w)
        chained = (
            probes.unionByName(step_ev)
            .withColumn("__nxt", nxt)
            .filter((F.col("__tag") == 1) & F.col("__nxt").isNotNull())
        )
        if win_us is not None:
            chained = chained.filter(
                F.col("__nxt") <= F.col("__a") + F.lit(win_us)
            )
        survivors = chained.select(
            "__user", "__a", F.col("__nxt").alias("__cur")
        )
        reach.append(survivors.select("__user", F.lit(i).alias("__step")))
    u = reach[0]
    for r in reach[1:]:
        u = u.unionByName(r)
    counts = u.agg(
        *[
            F.count_distinct(
                F.when(F.col("__step") == F.lit(i), F.col("__user"))
            )
            .cast("bigint")
            .alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    return _funnel_output(counts, steps)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(cohort_day, day_offset, n_users) — distinct users of each first-day
    cohort active ``day_offset`` days after their first day. Offset 0 row is
    the cohort size. ``max_offset_days`` truncates the long tail (None keeps
    all offsets).

    ``exact_distinct=False`` is the 10^12-row scale twin: the per-cell
    COUNT(DISTINCT) becomes an HLL ``approx_count_distinct`` sketch (~2%
    rsd), dropping the Expand/dedup of exact distinct aggregation — same
    switch profile_table and time_rollup's scale path use. The driver query
    keeps the exact default (cross-engine hash gate)."""
    w = Window.partitionBy("__user").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    df = events.select(
        F.col(user_col).alias("__user"), day.alias("__day")
    ).withColumn("cohort_day", F.min("__day").over(w))
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    out = (
        df.select(
            "__user",
            "cohort_day",
            F.datediff(F.col("__day"), F.col("cohort_day")).cast("int").alias(
                "day_offset"
            ),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(distinct("__user").cast("bigint").alias("n_users"))
    )
    if max_offset_days is not None:
        out = out.filter(F.col("day_offset") <= max_offset_days)
    return out


def transition_counts(
    events: DataFrame,
    group_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    normalize: bool = False,
) -> DataFrame:
    """(from_type, to_type, n_transitions [, p]) — the Markov transition
    matrix of the per-group event-type sequence (dialog-act / tool-call
    transition structure of a transcript corpus). One lag window over the
    group ordering + one vocabulary-sized hash aggregate; ``order_cols``
    break timestamp ties deterministically. ``normalize`` adds the row
    conditional probability p = n / sum(n per from_type), r6-rounded (the
    per-from sums are exact bigints, so p is cross-engine bit-stable)."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    df = events.select(
        F.col(group_col).alias("__g"),
        F.col(type_col).alias("__t"),
        ts_us.alias("__ts_us"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("__g").orderBy("__ts_us", *order_cols)
    out = (
        df.withColumn("__prev", F.lag("__t", 1).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_type"), F.col("__t").alias("to_type")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    if normalize:
        r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
        wf = Window.partitionBy("from_type")
        out = out.withColumn(
            "p",
            r6(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(wf).cast("double")
            ).cast("double"),
        )
    return out


def histogram_drift(
    events: DataFrame,
    value_expr: str,
    split_expr: str,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 160.0,
) -> DataFrame:
    """Distribution-drift table between the reference slice (``split_expr``
    true) and the current slice: fixed-width bins of ``value_expr`` over
    [lo, hi) plus underflow (-1) / overflow (n_bins) bins, each row carrying
    both counts and the Pearson chi-square contribution
    ((n_cur - e)^2 / e with e = n_ref * N_cur / N_ref, r6) — the drift
    statistic every feature-store monitor wants, in purely rational
    arithmetic so both engines agree bit-for-bit (no logs, unlike PSI).
    One scan, one (split, bin) aggregate, window totals over the tiny
    histogram frame.

    NULL values get their own NULL-bin row (they are missing data, not
    underflow — Spark's NULL-skipping ``greatest`` would otherwise silently
    clamp floor(NULL) into bin -1, and DuckDB's pre-1.1 NULL-propagating
    ``greatest`` would disagree with it)."""
    if n_bins <= 0 or not hi > lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    width = (hi - lo) / n_bins
    v = F.expr(value_expr).cast("double")
    bin_col = F.when(v.isNull(), F.lit(None).cast("int")).otherwise(
        F.least(
            F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(-1)),
            F.lit(n_bins),
        ).cast("int")
    )
    base = events.select(
        F.expr(split_expr).cast("boolean").alias("__is_ref"),
        bin_col.alias("bin_idx"),
    )
    hist = base.groupBy("bin_idx").agg(
        F.count(F.when(F.col("__is_ref"), F.lit(1))).cast("bigint").alias("n_ref"),
        F.count(F.when(~F.col("__is_ref"), F.lit(1))).cast("bigint").alias("n_cur"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    tot_ref = F.sum("n_ref").over(wall).cast("double")
    tot_cur = F.sum("n_cur").over(wall).cast("double")
    e = F.col("n_ref").cast("double") * tot_cur / tot_ref
    term = F.when(
        F.col("n_ref") > 0,
        r6((F.col("n_cur").cast("double") - e) * (F.col("n_cur") - e) / e),
    ).otherwise(F.lit(None).cast("double"))
    return hist.select(
        "bin_idx", "n_ref", "n_cur", term.cast("double").alias("chi2_term")
    )


def _interp_median(df: DataFrame, group_cols: list[str], value_col: str,
                   out_name: str) -> DataFrame:
    """Exact (n-1)*0.5 linear-interpolation median per group — the
    gap_percentiles recipe (deterministic neighbor pick + one interpolation
    in double, bit-identical cross-engine) as a reusable step. Rank ties on
    equal values are harmless: the neighbors are equal, so the interpolated
    value is identical regardless of tie order."""
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    v = F.col(value_col).cast("double")
    r = df.withColumn("_rk", F.row_number().over(w).cast("long") - 1) \
          .withColumn("_n", F.count(F.lit(1)).over(
              Window.partitionBy(*group_cols)).cast("long"))
    lo_idx = F.floor((F.col("_n") - 1) * F.lit(0.5)).cast("long")
    hi_idx = F.least(lo_idx + 1, F.col("_n") - 1)
    frac = (F.col("_n") - 1) * F.lit(0.5) - F.floor((F.col("_n") - 1) * F.lit(0.5))
    agg = r.groupBy(*group_cols).agg(
        F.max(F.when(F.col("_rk") == lo_idx, v)).alias("_lo"),
        F.max(F.when(F.col("_rk") == hi_idx, v)).alias("_hi"),
        F.min(frac).alias("_frac"),
    )
    med = F.col("_lo") + (F.col("_hi") - F.col("_lo")) * F.col("_frac")
    return agg.select(*group_cols, med.alias(out_name))


def mad_outlier_flags(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags: |v - median| > k * MAD, where MAD is
    the median absolute deviation (median of |v - median|). Median/MAD use
    exact deterministic interpolation (never an engine-internal percentile,
    whose float-op order differs across engines), so the emitted statistics
    and flags are bit-identical cross-engine — driver query ``mad_outliers``.

    Robustness rationale: mean/std (the z-score family, W11) are themselves
    dragged by the outliers they are meant to find; median/MAD have a 50%
    breakdown point. The classic 1.4826 normal-consistency factor is NOT
    baked in — fold it into ``k`` (e.g. k=3*1.4826) when the normal-scale
    convention is wanted. MAD=0 groups (over half the values identical)
    flag any deviation, the standard convention.

    Scale shape: two rank-window + aggregate rounds and two group-keyed
    joins, all hash-partitioned on the SAME group key — 100-TB cost is a
    few co-keyed exchanges, never a sort of the whole table by value.
    Reference basis: the robust twin of the reference's per-flow mean/std
    vector entries (flow.py:148-171).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    med = _interp_median(df, group_cols, value_col, "_med")
    with_med = df.join(med, group_cols, "inner").withColumn(
        "_absdev", F.abs(F.col(value_col).cast("double") - F.col("_med"))
    )
    mad = _interp_median(with_med, group_cols, "_absdev", "_mad")
    out = with_med.join(mad, group_cols, "inner")
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    return (
        out.withColumn("is_outlier", F.col("_absdev") > F.lit(float(k)) * F.col("_mad"))
        .withColumn("med", r6(F.col("_med")))
        .withColumn("mad", r6(F.col("_mad")))
        .drop("_med", "_mad", "_absdev")
    )
