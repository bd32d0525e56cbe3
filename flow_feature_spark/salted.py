"""Salt-bucketed partial-moment aggregation for skewed (hot) conversations.

A mega-conversation (one conv_id with ~100x the median turns) makes any
groupBy-conv plan straggle: one task owns the whole group. This module splits
each session into contiguous TURN-RANGE buckets, computes partial moments per
(conv, session, bucket) — embarrassingly parallel across buckets — and merges
the small per-session bucket lists exactly (SURVEY.md §4.1):

* count / sum / sumsq / min / max merge additively for win/plen/flags/hdr;
* inter-turn-gap stats merge additively PLUS the stitched boundary gaps: each
  bucket carries its first/last timestamp per direction, and the merge walks
  buckets in order adding the (last-ts-of-earlier, first-ts-of-later) gap —
  skipping buckets empty in that direction — so the merged gap population is
  exactly the unsalted one.

Variance uses the one-pass raw-moment form (sumsq/n - mean^2) on the merged
moments — allclose (<= one rounding quantum) to the centered exact kernel;
asserted in tests on hot-key data.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flow_feature_spark.kernel import _rounder
from flow_feature_spark.schema import (
    DURATION_EPSILON,
    FEATURE_NAMES,
    FEATURE_SCHEMA,
)

DEFAULT_BUCKET_TURNS = 8192


def _partial_aggs() -> list:
    """Column expressions for per-bucket partial moments."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min("ts_us").alias("min_us"),
        F.max("ts_us").alias("max_us"),
    ]
    fwd = F.col("is_fwd")
    for dirn, mask in (("f", fwd), ("b", ~fwd), ("d", F.lit(True))):
        m = lambda c: F.when(mask, c)  # noqa: E731
        aggs += [
            F.count(m(F.lit(1))).alias(f"{dirn}_n"),
            F.min(m(F.col("ts_us"))).alias(f"{dirn}_first_us"),
            F.max(m(F.col("ts_us"))).alias(f"{dirn}_last_us"),
        ]
        for col in ("win", "plen"):
            x = m(F.col(col)).cast("double")
            aggs += [
                F.sum(x).alias(f"{dirn}_{col}_sum"),
                F.sum(x * x).alias(f"{dirn}_{col}_sumsq"),
                F.min(m(F.col(col))).alias(f"{dirn}_{col}_min"),
                F.max(m(F.col(col))).alias(f"{dirn}_{col}_max"),
            ]
        # within-bucket, per-direction gap moments (computed pre-agg, see below)
        g = m(F.col(f"gap_{dirn}")).cast("double")
        aggs += [
            F.count(g).alias(f"{dirn}_gap_n"),
            F.sum(g).alias(f"{dirn}_gap_sum"),
            F.sum(g * g).alias(f"{dirn}_gap_sumsq"),
            F.min(g).alias(f"{dirn}_gap_min"),
            F.max(g).alias(f"{dirn}_gap_max"),
        ]
        aggs.append(
            F.sum(m(F.lit(14) + 4 * F.col("ihl") + F.lit(20))).alias(f"{dirn}_hdr")
        )
    for i in range(8):
        bit = F.shiftright(F.col("flags"), i).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit).alias(f"flag{i}"))
        if i in (3, 5):
            aggs.append(F.sum(F.when(fwd, bit)).alias(f"fwd_flag{i}"))
            aggs.append(F.sum(F.when(~fwd, bit)).alias(f"bwd_flag{i}"))
    return aggs


class _M:
    """Running merged moments for one statistic family."""

    __slots__ = ("n", "s", "sq", "mn", "mx")

    def __init__(self):
        self.n = 0
        self.s = 0.0
        self.sq = 0.0
        self.mn = math.inf
        self.mx = -math.inf

    def add_moments(self, n, s, sq, mn, mx):
        if not n:
            return
        self.n += int(n)
        self.s += float(s)
        self.sq += float(sq)
        self.mn = min(self.mn, float(mn))
        self.mx = max(self.mx, float(mx))

    def add_value(self, v: float):
        self.add_moments(1, v, v * v, v, v)

    def stats(self, r, scale: float = 1.0):
        if self.n == 0:
            return [0.0, 0.0, 0.0, 0.0]
        mean = self.s / self.n
        var = max(self.sq / self.n - mean * mean, 0.0)
        return [
            r(mean / scale),
            r(self.mn / scale),
            r(self.mx / scale),
            r(math.sqrt(var) / scale),
        ]

    def sum_r(self, r):
        return r(self.s) if self.n else 0.0


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
    hdr = {d: 0.0 for d in "fbd"}

    for row in b.itertuples(index=False):
        for d in "fbd":
            dn = getattr(row, f"{d}_n")
            if not dn:
                continue
            dir_n[d] += int(dn)
            # stitched boundary gap into this bucket's first same-direction turn
            first_us = getattr(row, f"{d}_first_us")
            if last_us[d] is not None:
                gaps[d].add_value((first_us - last_us[d]) / 1e6)
            last_us[d] = getattr(row, f"{d}_last_us")
            gaps[d].add_moments(
                getattr(row, f"{d}_gap_n") or 0,
                getattr(row, f"{d}_gap_sum") or 0.0,
                getattr(row, f"{d}_gap_sumsq") or 0.0,
                getattr(row, f"{d}_gap_min") if getattr(row, f"{d}_gap_n") else math.inf,
                getattr(row, f"{d}_gap_max") if getattr(row, f"{d}_gap_n") else -math.inf,
            )
            for c in ("win", "plen"):
                lens[(d, c)].add_moments(
                    dn,
                    getattr(row, f"{d}_{c}_sum") or 0.0,
                    getattr(row, f"{d}_{c}_sumsq") or 0.0,
                    getattr(row, f"{d}_{c}_min"),
                    getattr(row, f"{d}_{c}_max"),
                )
            h = getattr(row, f"{d}_hdr")
            hdr[d] += float(h) if h is not None else 0.0

    for d, prefix in (("f", "fiat"), ("b", "biat"), ("d", "diat")):
        # gap moments are already in seconds (bucketed gaps and stitched
        # boundary gaps are both /1e6 before accumulation)
        for name, v in zip(("mean", "min", "max", "std"), gaps[d].stats(r)):
            out[f"{prefix}_{name}"] = v
    duration = r((float(b["max_us"].max()) - float(b["min_us"].min())) / 1e6 + DURATION_EPSILON)
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
        out[name] = float(b[f"flag{i}"].fillna(0).sum())
    out["fwd_pst_cnt"] = float(b["fwd_flag3"].fillna(0).sum()) if fp else -1.0
    out["fwd_urg_cnt"] = float(b["fwd_flag5"].fillna(0).sum()) if fp else -1.0
    out["bwd_pst_cnt"] = float(b["bwd_flag3"].fillna(0).sum()) if bp else -1.0
    out["bwd_urg_cnt"] = float(b["bwd_flag5"].fillna(0).sum()) if bp else -1.0
    out["fp_hdr_len"] = hdr["f"]
    out["bp_hdr_len"] = hdr["b"]
    out["dp_hdr_len"] = hdr["f"] + hdr["b"]
    out["f_ht_len"] = r(hdr["f"] / max(out["fpl_total"], 1))
    out["b_ht_len"] = r(hdr["b"] / max(out["bpl_total"], 1))
    out["d_ht_len"] = r(out["dp_hdr_len"] / max(out["dpl_total"], 1))

    out["session_start_ts"] = float(b["min_us"].min()) / 1e6
    out["session_end_ts"] = float(b["max_us"].max()) / 1e6
    out["n_turns"] = n
    return out


def salted_session_features(
    sess: DataFrame,
    bucket_turns: int = DEFAULT_BUCKET_TURNS,
    rounding: str = "half_even",
) -> DataFrame:
    """Skew-proof feature extraction: partial moments per turn-range bucket
    (hash-parallel — a hot conv spreads over many tasks), exact merge per
    session (each merge input is ~n_turns/bucket_turns tiny rows).

    The within-bucket gap columns reuse the per-direction lag over the
    session-scoped window; the bucket boundary gaps are stitched at merge.
    """
    w_all = Window.partitionBy("conv_id", "session_id").orderBy("ts_us", "turn_idx")
    w_dir = Window.partitionBy("conv_id", "session_id", "is_fwd").orderBy("ts_us", "turn_idx")
    t = (
        sess.withColumn("rn", F.row_number().over(w_all))
        .withColumn("bucket", ((F.col("rn") - 1) / F.lit(bucket_turns)).cast("long"))
        .withColumn("gap_d", F.col("ts_us") - F.lag("ts_us").over(w_all))
        .withColumn("gap_dir", F.col("ts_us") - F.lag("ts_us").over(w_dir))
    )
    # keep gaps within the bucket: a gap whose earlier endpoint falls in the
    # previous bucket is dropped here and re-added at merge via the stitch.
    same_bucket_all = F.lag("bucket").over(w_all) == F.col("bucket")
    same_bucket_dir = F.lag("bucket").over(w_dir) == F.col("bucket")
    t = (
        t.withColumn("gap_d", (F.when(same_bucket_all, F.col("gap_d")) / 1e6))
        .withColumn("gap_dir_v", (F.when(same_bucket_dir, F.col("gap_dir")) / 1e6))
        .withColumn("gap_f", F.when(F.col("is_fwd"), F.col("gap_dir_v")))
        .withColumn("gap_b", F.when(~F.col("is_fwd"), F.col("gap_dir_v")))
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
    hot_turn_threshold: int = 200_000,
) -> DataFrame:
    """Skew-adaptive routing: mega-conversations go through the salted
    partial-moment path (their turns spread across many tasks), everything
    else through the fused single-pass kernel. The hot-key set comes from a
    cheap partial-aggregated count and is broadcast into semi/anti splits.
    """
    from pyspark.sql import functions as F

    from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
    from flow_feature_spark.sessionize import assign_sessions

    counts = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    hot = counts.filter(F.col("n") >= hot_turn_threshold).select("conv_id")

    cold = turns.join(F.broadcast(hot), "conv_id", "left_anti")
    cold_feats = sessionize_and_extract_fast(cold, gap_seconds, rounding=rounding)

    hot_turns = turns.join(F.broadcast(hot), "conv_id", "left_semi")
    hot_sess = assign_sessions(hot_turns, gap_seconds=gap_seconds)
    hot_feats = salted_session_features(hot_sess, rounding=rounding)
    return cold_feats.unionByName(hot_feats)
