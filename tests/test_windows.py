"""lag/lead/backfill and point-in-time cumulative features vs pandas
expanding() (SURVEY.md §2.5 W2/W3/W6)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.sessionize import assign_sessions
from flow_feature_spark.synth import synth_transcripts
from flow_feature_spark.windows import (
    backward_fill,
    cumulative_turn_features,
    forward_fill,
    with_lag_lead,
)


def _mk(spark):
    rows = [
        ("c1", 0, "user", "aa", None, 0.0),
        ("c1", 1, "assistant", None, "search", 1.0),
        ("c1", 2, "user", "cccc", None, 3.0),
        ("c1", 3, "assistant", None, None, 6.0),
    ]
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(c, i, r, t, tool, base + dt.timedelta(seconds=s)) for c, i, r, t, tool, s in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    return normalize_turns(df)


def test_lag_lead(spark):
    out = with_lag_lead(_mk(spark), ["plen"], offsets=(1,))
    got = {r["turn_idx"]: (r["plen_lag1"], r["plen_lead1"]) for r in out.collect()}
    assert got == {0: (None, 0), 1: (2, 4), 2: (0, 0), 3: (4, None)}


def test_ffill_bfill(spark):
    df = _mk(spark).withColumn("tool2", F.when(F.col("flags") > 0, F.lit("search")))
    out = backward_fill(forward_fill(df, ["tool2"]), ["tool2"])
    got = {r["turn_idx"]: (r["tool2_ffill"], r["tool2_bfill"]) for r in out.collect()}
    assert got == {
        0: (None, "search"),
        1: ("search", "search"),
        2: ("search", None),
        3: ("search", None),
    }


def test_cumulative_matches_pandas_expanding(spark):
    tr = synth_transcripts(spark, n_convs=12, turns_mean=12, hot_factor=3)
    sess = assign_sessions(normalize_turns(tr), gap_seconds=1800.0)
    out = cumulative_turn_features(sess, value_cols=("plen",)).select(
        "conv_id", "session_id", "turn_idx", "ts_sec", "plen",
        "run_n_turns", "run_elapsed_s", "run_plen_mean", "run_plen_std",
        "run_plen_min", "run_plen_max", "run_plen_sum",
    )
    pdf = out.toPandas().sort_values(["conv_id", "session_id", "ts_sec", "turn_idx"])
    for (_, _), g in pdf.groupby(["conv_id", "session_id"]):
        exp = g["plen"].expanding()
        np.testing.assert_allclose(g["run_plen_mean"], exp.mean(), rtol=1e-9)
        np.testing.assert_allclose(g["run_plen_sum"], exp.sum(), rtol=1e-9)
        np.testing.assert_allclose(g["run_plen_min"], exp.min(), rtol=1e-9)
        np.testing.assert_allclose(g["run_plen_max"], exp.max(), rtol=1e-9)
        np.testing.assert_allclose(
            g["run_plen_std"], exp.std(ddof=0).fillna(0.0), rtol=1e-6, atol=1e-9
        )
        assert (g["run_n_turns"].to_numpy() == np.arange(1, len(g) + 1)).all()


def test_cumulative_is_point_in_time_safe(spark):
    """Dropping the last turn must not change any earlier row's running stats."""
    tr = synth_transcripts(spark, n_convs=6, turns_mean=8, hot_factor=2)
    sess = assign_sessions(normalize_turns(tr), gap_seconds=1800.0).cache()
    full = cumulative_turn_features(sess, value_cols=("plen",))
    last_idx = sess.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"))
    trunc_in = sess.join(last_idx, "conv_id").filter(F.col("turn_idx") < F.col("mx")).drop("mx")
    trunc = cumulative_turn_features(trunc_in, value_cols=("plen",))
    key = ["conv_id", "session_id", "turn_idx"]
    a = {tuple(r[k] for k in key): r["run_plen_std"] for r in full.collect()}
    b = {tuple(r[k] for k in key): r["run_plen_std"] for r in trunc.collect()}
    for k, v in b.items():
        assert a[k] == pytest.approx(v, rel=1e-12)
