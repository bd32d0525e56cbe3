"""Salt-bucketed partial-moment aggregation for skewed (hot) conversations.

A mega-conversation (one conv_id with ~100x the median turns) makes any
groupBy-conv plan straggle: one task owns the whole group. This module splits
each session into contiguous TURN-RANGE buckets, computes exact partial
moments per (conv, session, bucket) — embarrassingly parallel across buckets —
and merges the small per-session bucket lists exactly (SURVEY.md §4.1):

* count / sum / sumsq / min / max merge additively for win/plen/flags/hdr;
* inter-turn-gap stats merge additively PLUS the stitched boundary gaps: each
  bucket carries its first/last timestamp per direction, and the merge walks
  buckets in order adding the (last-ts-of-earlier, first-ts-of-later) gap —
  skipping buckets empty in that direction — so the merged gap population is
  exactly the unsalted one.

Skew-safety (the whole point): NO window is partitioned by the raw session
key. ``bucket`` is pure ``turn_idx`` arithmetic (no row_number pre-pass), and
the within-bucket gap lags run over (conv, session, bucket[, direction])
windows whose partitions are bounded at ``bucket_turns`` rows — a 10^7-turn
conversation spreads over 10^7/bucket_turns tasks instead of funnelling
through one.

Precondition (holds for the transcript contract and the reference's packet
captures alike): within a conversation, ``turn_idx`` order refines the
(ts, turn_idx) sort order — i.e. ts is non-decreasing in turn_idx. turn_idx
IS the turn ordinal, so contiguous turn_idx ranges are contiguous time ranges
and boundary stitching reconstructs the exact gap population.

Exactness: every partial moment is accumulated in an exact domain (bigint µs
sums, DECIMAL(38,0) for summed squared-µs gaps, bigint for length/budget
sums/sumsq), merged as Python ints, and converted to double with the SAME
operation sequence as ``kernel._exact_stats4`` — using the identity
``sum((x*n - s)^2) == n*(n*sum(x^2) - s^2)`` over exact integers — so the
salted output is BIT-IDENTICAL to the unsalted kernel (asserted in
tests/test_salted.py) and shares its DuckDB oracle.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flow_feature_spark.kernel import _rounder
from flow_feature_spark.schema import (
    DURATION_EPSILON,
    FEATURE_SCHEMA,
)

DEFAULT_BUCKET_TURNS = 8192

# At 10^12 scale the router should only divert conversations that materially
# exceed a partition's share (BENCH/SCALE_SMOKE.md: routing LOSES when the hot
# partition is merely ~2.5x average) — default to "several times the target
# partition row count", not a small constant.
DEFAULT_HOT_TURN_THRESHOLD = 2_000_000


def _zero_bigint(col: F.Column) -> F.Column:
    return F.coalesce(col, F.lit(0)).cast("long")


def _partial_aggs() -> list:
    """Exact-domain per-bucket partial moments.

    All sums are bigint (lengths, budgets, µs gaps — bounded well below 2^63
    per bucket) except the squared-µs-gap sums, which exceed int64 and go
    through DECIMAL(19,0)*DECIMAL(19,0) -> DECIMAL(38,0) accumulation.
    Everything is coalesced to 0 so the merge-side pandas frame keeps clean
    int64/decimal dtypes (a single NULL would flip the column to float64 and
    break >2^53 exactness).
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min("ts_us").alias("min_us"),
        F.max("ts_us").alias("max_us"),
    ]
    fwd = F.col("is_fwd")
    dec0 = F.lit(0).cast("decimal(38,0)")
    for dirn, mask in (("f", fwd), ("b", ~fwd), ("d", F.lit(True))):
        m = lambda c: F.when(mask, c)  # noqa: E731
        aggs += [
            F.count(m(F.lit(1))).alias(f"{dirn}_n"),
            _zero_bigint(F.min(m(F.col("ts_us")))).alias(f"{dirn}_first_us"),
            _zero_bigint(F.max(m(F.col("ts_us")))).alias(f"{dirn}_last_us"),
        ]
        for col in ("win", "plen"):
            x = m(F.col(col)).cast("long")
            aggs += [
                _zero_bigint(F.sum(x)).alias(f"{dirn}_{col}_sum"),
                _zero_bigint(F.sum(x * x)).alias(f"{dirn}_{col}_sumsq"),
                _zero_bigint(F.min(x)).alias(f"{dirn}_{col}_min"),
                _zero_bigint(F.max(x)).alias(f"{dirn}_{col}_max"),
            ]
        # within-bucket, per-direction µs gaps (bucket-scoped lag, see below)
        g = m(F.col(f"gap_{dirn}")).cast("long")
        gd = m(F.col(f"gap_{dirn}")).cast("decimal(19,0)")
        aggs += [
            F.count(g).alias(f"{dirn}_gap_n"),
            _zero_bigint(F.sum(g)).alias(f"{dirn}_gap_sum"),
            F.coalesce(F.sum(gd * gd), dec0).alias(f"{dirn}_gap_sumsq"),
            _zero_bigint(F.min(g)).alias(f"{dirn}_gap_min"),
            _zero_bigint(F.max(g)).alias(f"{dirn}_gap_max"),
        ]
        aggs.append(
            _zero_bigint(
                F.sum(m(F.lit(14) + 4 * F.col("ihl") + F.lit(20)))
            ).alias(f"{dirn}_hdr")
        )
    for i in range(8):
        bit = F.shiftright(F.col("flags"), i).bitwiseAND(F.lit(1))
        aggs.append(_zero_bigint(F.sum(bit)).alias(f"flag{i}"))
        if i in (3, 5):
            aggs.append(_zero_bigint(F.sum(F.when(fwd, bit))).alias(f"fwd_flag{i}"))
            aggs.append(_zero_bigint(F.sum(F.when(~fwd, bit))).alias(f"bwd_flag{i}"))
    return aggs


class _M:
    """Running merged moments for one statistic family — exact Python ints."""

    __slots__ = ("n", "s", "sq", "mn", "mx")

    def __init__(self):
        self.n = 0
        self.s = 0
        self.sq = 0
        self.mn = None
        self.mx = None

    def add_moments(self, n, s, sq, mn, mx):
        if not n:
            return
        self.n += int(n)
        self.s += int(s)
        self.sq += int(sq)
        mn, mx = int(mn), int(mx)
        self.mn = mn if self.mn is None else min(self.mn, mn)
        self.mx = mx if self.mx is None else max(self.mx, mx)

    def add_value(self, v: int):
        v = int(v)
        self.add_moments(1, v, v * v, v, v)

    def stats(self, r, scale: float = 1.0, centered: bool = False):
        """[mean, min, max, std_pop] with kernel._exact_stats4's exact float
        sequence: centered uses S = n*(n*sumsq - s^2) == sum((x*n - s)^2)."""
        if self.n == 0:
            return [0.0, 0.0, 0.0, 0.0]
        n, s = self.n, self.s
        mean_raw = float(s) / n
        if centered:
            S = n * (n * self.sq - s * s)
            std = math.sqrt(float(S) / n / n / n) / scale
        else:
            var = max(float(self.sq) / n - mean_raw * mean_raw, 0.0)
            std = math.sqrt(var) / scale
        return [
            r(mean_raw / scale),
            r(float(self.mn) / scale),
            r(float(self.mx) / scale),
            r(std),
        ]

    def sum_r(self, r):
        return r(float(self.s)) if self.n else 0.0


def _merge_session(buckets: pd.DataFrame, rounding: str) -> dict | None:
    """Merge one session's ordered bucket rows into the 72-vector."""
    r = _rounder(rounding)
    b = buckets.sort_values("bucket")
    n = int(b["n"].sum())
    if n <= 1:
        return None

    out: dict = {}
    gaps = {d: _M() for d in "fbd"}
    lens = {(d, c): _M() for d in "fbd" for c in ("win", "plen")}
    last_us = {d: None for d in "fbd"}
    dir_n = {d: 0 for d in "fbd"}
    hdr = {d: 0 for d in "fbd"}

    for row in b.itertuples(index=False):
        for d in "fbd":
            dn = getattr(row, f"{d}_n")
            if not dn:
                continue
            dir_n[d] += int(dn)
            # stitched boundary gap into this bucket's first same-direction turn
            first_us = int(getattr(row, f"{d}_first_us"))
            if last_us[d] is not None:
                gaps[d].add_value(first_us - last_us[d])
            last_us[d] = int(getattr(row, f"{d}_last_us"))
            gn = int(getattr(row, f"{d}_gap_n"))
            if gn:
                gaps[d].add_moments(
                    gn,
                    getattr(row, f"{d}_gap_sum"),
                    getattr(row, f"{d}_gap_sumsq"),  # Decimal -> int in _M
                    getattr(row, f"{d}_gap_min"),
                    getattr(row, f"{d}_gap_max"),
                )
            for c in ("win", "plen"):
                lens[(d, c)].add_moments(
                    dn,
                    getattr(row, f"{d}_{c}_sum"),
                    getattr(row, f"{d}_{c}_sumsq"),
                    getattr(row, f"{d}_{c}_min"),
                    getattr(row, f"{d}_{c}_max"),
                )
            hdr[d] += int(getattr(row, f"{d}_hdr"))

    for d, prefix in (("f", "fiat"), ("b", "biat"), ("d", "diat")):
        # gap moments are exact integer µs; scale=1e6 converts at the end,
        # centered=True matches kernel._iat_stats bit-for-bit
        for name, v in zip(("mean", "min", "max", "std"),
                           gaps[d].stats(r, scale=1e6, centered=True)):
            out[f"{prefix}_{name}"] = v
    gmin = int(b["min_us"].min())
    gmax = int(b["max_us"].max())
    duration = r(float(gmax - gmin) / 1e6 + DURATION_EPSILON)
    out["duration"] = duration
    for d, fam in (("f", "fwin"), ("b", "bwin"), ("d", "dwin")):
        m = lens[(d, "win")]
        out[f"{fam}_total"] = m.sum_r(r)
        for name, v in zip(("mean", "min", "max", "std"), m.stats(r)):
            out[f"{fam}_{name}"] = v
    fp, bp = dir_n["f"], dir_n["b"]
    out["fpnum"], out["bpnum"], out["dpnum"] = float(fp), float(bp), float(n)
    out["bfpnum_rate"] = r(bp / max(fp, 1))
    out["fpnum_s"] = r(fp / duration)
    out["bpnum_s"] = r(bp / duration)
    out["dpnum_s"] = out["fpnum_s"] + out["bpnum_s"]
    for d, fam in (("f", "fpl"), ("b", "bpl"), ("d", "dpl")):
        m = lens[(d, "plen")]
        out[f"{fam}_total"] = m.sum_r(r)
        for name, v in zip(("mean", "min", "max", "std"), m.stats(r)):
            out[f"{fam}_{name}"] = v
    out["bfpl_rate"] = r(out["bpl_total"] / max(out["fpl_total"], 1))
    out["fpl_s"] = r(out["fpl_total"] / duration)
    out["bpl_s"] = r(out["bpl_total"] / duration)
    out["dpl_s"] = out["fpl_s"] + out["bpl_s"]
    flag_names = ["fin_cnt", "syn_cnt", "rst_cnt", "pst_cnt",
                  "ack_cnt", "urg_cnt", "cwe_cnt", "ece_cnt"]
    for i, name in enumerate(flag_names):
        out[name] = float(int(b[f"flag{i}"].sum()))
    out["fwd_pst_cnt"] = float(int(b["fwd_flag3"].sum())) if fp else -1.0
    out["fwd_urg_cnt"] = float(int(b["fwd_flag5"].sum())) if fp else -1.0
    out["bwd_pst_cnt"] = float(int(b["bwd_flag3"].sum())) if bp else -1.0
    out["bwd_urg_cnt"] = float(int(b["bwd_flag5"].sum())) if bp else -1.0
    out["fp_hdr_len"] = float(hdr["f"])
    out["bp_hdr_len"] = float(hdr["b"])
    out["dp_hdr_len"] = float(hdr["f"]) + float(hdr["b"])
    out["f_ht_len"] = r(out["fp_hdr_len"] / max(out["fpl_total"], 1))
    out["b_ht_len"] = r(out["bp_hdr_len"] / max(out["bpl_total"], 1))
    out["d_ht_len"] = r(out["dp_hdr_len"] / max(out["dpl_total"], 1))

    out["session_start_ts"] = float(gmin / 1e6)
    out["session_end_ts"] = float(gmax / 1e6)
    out["n_turns"] = n
    return out


def salted_session_features(
    sess: DataFrame,
    bucket_turns: int = DEFAULT_BUCKET_TURNS,
    rounding: str = "half_even",
) -> DataFrame:
    """Skew-proof feature extraction: exact partial moments per turn-range
    bucket (hash-parallel — a hot conv spreads over many tasks), exact merge
    per session (each merge input is ~n_turns/bucket_turns tiny rows).

    ``bucket`` is pure turn_idx arithmetic — no pre-pass window over the raw
    session key anywhere in the plan. The within-bucket gap lags run over
    bucket-scoped windows whose partitions are capped at ``bucket_turns``
    rows; cross-bucket boundary gaps are stitched exactly at merge time.
    """
    t = sess.withColumn(
        "bucket", F.floor(F.col("turn_idx").cast("long") / F.lit(bucket_turns)).cast("long")
    )
    # EXPLICIT repartition on the bucket key: the bucket-scoped windows'
    # ClusteredDistribution is otherwise satisfied by the upstream conv_id
    # hash partitioning (a key subset), which would keep every bucket of a
    # mega-conversation inside ONE task — exactly the straggler this module
    # exists to kill. The extra exchange moves each bucket to its own task.
    t = t.repartition("conv_id", "session_id", "bucket")
    wb_all = Window.partitionBy("conv_id", "session_id", "bucket").orderBy(
        "ts_us", "turn_idx"
    )
    wb_dir = Window.partitionBy("conv_id", "session_id", "bucket", "is_fwd").orderBy(
        "ts_us", "turn_idx"
    )
    # lag is NULL at each bucket/direction start -> the dropped boundary gaps
    # are exactly the ones the merge re-adds via first/last-ts stitching
    t = (
        t.withColumn("gap_d", F.col("ts_us") - F.lag("ts_us").over(wb_all))
        .withColumn("gap_dir", F.col("ts_us") - F.lag("ts_us").over(wb_dir))
        .withColumn("gap_f", F.when(F.col("is_fwd"), F.col("gap_dir")))
        .withColumn("gap_b", F.when(~F.col("is_fwd"), F.col("gap_dir")))
    )
    partials = t.groupBy("conv_id", "session_id", "bucket").agg(*_partial_aggs())

    out_cols = [f.name for f in FEATURE_SCHEMA.fields]

    def merge_conv(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        # one Python call per conv (not per session): wide-frame per-call
        # overhead amortizes over all of the conv's sessions
        rows: list[dict] = []
        for sid, grp in pdf.groupby("session_id", sort=False):
            row = _merge_session(grp, rounding)
            if row is None:
                continue
            row["conv_id"] = keys[0]
            row["session_id"] = int(sid)
            rows.append(row)
        if not rows:
            return pd.DataFrame(columns=out_cols)
        return pd.DataFrame(rows, columns=out_cols)

    return partials.groupBy("conv_id").applyInPandas(merge_conv, schema=FEATURE_SCHEMA)


def adaptive_session_features(
    turns: DataFrame,
    gap_seconds: float,
    rounding: str = "half_even",
    hot_turn_threshold: int = DEFAULT_HOT_TURN_THRESHOLD,
    bucket_turns: int = DEFAULT_BUCKET_TURNS,
) -> DataFrame:
    """Skew-adaptive routing: mega-conversations go through the salted
    partial-moment path (their turns spread across many tasks), everything
    else through the fused single-pass kernel. The hot-key set comes from a
    cheap partial-aggregated count and is broadcast into semi/anti splits.

    The hot path is end-to-end skew-proof: session ASSIGNMENT itself runs
    through the bucketized two-pass sessionizer (no per-conv single-task
    window anywhere — VERDICT r2's last skew surface), and the bucketized
    precondition (ts non-decreasing in turn_idx, salted.py:23-27) is VALIDATED
    at runtime: hot conversations that violate it are routed to the
    order-agnostic grouped exact kernel instead of silently producing wrong
    gap populations. The violator scan runs only over the hot subset and is
    itself bucket-parallel (sessionize.precondition_violations).

    The default threshold is deliberately high (BENCH/SCALE_SMOKE.md measured
    the routed plan LOSING at ~2.5x-average skew): route only conversations
    that dwarf a partition's row share.
    """
    from pyspark.sql import functions as F

    from flow_feature_spark.kernel import extract_session_features
    from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
    from flow_feature_spark.sessionize import (
        assign_sessions,
        assign_sessions_bucketed,
        precondition_violations,
    )

    counts = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    hot = counts.filter(F.col("n") >= hot_turn_threshold).select("conv_id")

    cold = turns.join(F.broadcast(hot), "conv_id", "left_anti")
    cold_feats = sessionize_and_extract_fast(cold, gap_seconds, rounding=rounding)

    hot_turns = turns.join(F.broadcast(hot), "conv_id", "left_semi")
    # the violator CONV-ID set is collected eagerly: it is bounded by the
    # number of mega-conversations (tiny by construction — this is a key
    # list, not data rows), and knowing it on the driver lets the
    # normally-empty exact-kernel branch and its extra full-input scan +
    # anti-join drop out of the plan entirely instead of running as empty
    # stages. NB: this makes the router run one small Spark job at CALL time.
    bad_ids = [
        r[0]
        for r in precondition_violations(
            hot_turns, bucket_turns=bucket_turns
        ).collect()
    ]
    hot_ok = (
        hot_turns.filter(~F.col("conv_id").isin(bad_ids)) if bad_ids else hot_turns
    )
    hot_sess = assign_sessions_bucketed(
        hot_ok, gap_seconds=gap_seconds, bucket_turns=bucket_turns
    )
    hot_feats = salted_session_features(
        hot_sess, bucket_turns=bucket_turns, rounding=rounding
    )
    out = cold_feats.unionByName(hot_feats)

    if bad_ids:
        # violators: exact but per-conv-windowed — correctness over speed for
        # out-of-order hot conversations
        bad_turns = hot_turns.filter(F.col("conv_id").isin(bad_ids))
        bad_sess = assign_sessions(bad_turns, gap_seconds=gap_seconds)
        out = out.unionByName(extract_session_features(bad_sess, rounding=rounding))
    return out
