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


def test_rolling_matches_pandas_rolling(spark):
    from flow_feature_spark.windows import rolling_turn_features

    tr = synth_transcripts(spark, n_convs=10, turns_mean=15, hot_factor=3)
    sess = assign_sessions(normalize_turns(tr), gap_seconds=1800.0)
    k = 4
    out = rolling_turn_features(sess, value_col="plen", k=k).select(
        "conv_id", "session_id", "turn_idx", "ts_sec", "plen",
        "roll_cnt", "roll_sum", "roll_mean", "roll_min", "roll_max",
    )
    pdf = out.toPandas().sort_values(["conv_id", "session_id", "ts_sec", "turn_idx"])
    for (_, _), g in pdf.groupby(["conv_id", "session_id"]):
        roll = g["plen"].rolling(window=k, min_periods=1)
        np.testing.assert_array_equal(g["roll_sum"], roll.sum().astype("int64"))
        np.testing.assert_array_equal(g["roll_min"], roll.min().astype("int64"))
        np.testing.assert_array_equal(g["roll_max"], roll.max().astype("int64"))
        np.testing.assert_array_equal(g["roll_cnt"], roll.count().astype("int64"))
        np.testing.assert_allclose(g["roll_mean"], roll.mean(), rtol=0, atol=5.1e-7)


def test_rolling_k1_is_identity(spark):
    from flow_feature_spark.windows import rolling_turn_features

    tr = synth_transcripts(spark, n_convs=4, turns_mean=6, hot_factor=1)
    sess = assign_sessions(normalize_turns(tr), gap_seconds=1800.0)
    out = rolling_turn_features(sess, value_col="plen", k=1)
    bad = out.filter(
        (F.col("roll_sum") != F.col("plen")) | (F.col("roll_cnt") != 1)
        | (F.col("roll_min") != F.col("plen")) | (F.col("roll_max") != F.col("plen"))
    )
    assert bad.count() == 0


def test_gap_percentiles_match_spark_percentile(spark):
    """The manual interpolation SQL (shared cross-engine template) agrees with
    Spark's built-in exact percentile (same (n-1)*p linear definition)."""
    from flow_feature_spark import oracle_queries as OQ

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.createOrReplaceTempView("events")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    manual = {
        (r["conv_id"], r["session_id"]): (r["gap_p50_s"], r["gap_p90_s"], r["gap_p99_s"])
        for r in spark.sql(OQ.gap_percentiles_sql("spark")).collect()
    }
    builtin_sql = f"""
    WITH {OQ.turns_cte('spark')}, {OQ.sess_cte()},
    g AS (
      SELECT conv_id, session_id,
             ts_us - lag(ts_us) OVER (PARTITION BY conv_id, session_id
                                      ORDER BY ts_us, turn_idx) AS gap_us
      FROM sess
    )
    SELECT conv_id, session_id,
           percentile(gap_us, array(0.5, 0.9, 0.99)) AS p
    FROM g WHERE gap_us IS NOT NULL GROUP BY conv_id, session_id
    """
    builtin = {
        (r["conv_id"], r["session_id"]): tuple(v / 1e6 for v in r["p"])
        for r in spark.sql(builtin_sql).collect()
    }
    assert manual.keys() == builtin.keys()
    for key, vals in manual.items():
        np.testing.assert_allclose(vals, builtin[key], rtol=0, atol=5.1e-7)


def test_approx_percentile_scale_twin(spark):
    """The 100-TB path for gap percentiles: approx_percentile (merge-safe
    t-digest-style sketch) stays within accuracy*range of the exact linear
    interpolation the gap_percentiles oracle computes."""
    from flow_feature_spark import oracle_queries as OQ

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.createOrReplaceTempView("events")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sql = f"""
    WITH {OQ.turns_cte('spark')}, {OQ.sess_cte()},
    g AS (
      SELECT conv_id, ts_us - lag(ts_us) OVER (PARTITION BY conv_id, session_id
             ORDER BY ts_us, turn_idx) AS gap_us
      FROM sess
    )
    SELECT percentile(gap_us, 0.5) AS exact_p50,
           approx_percentile(gap_us, 0.5, 10000) AS approx_p50,
           min(gap_us) AS lo, max(gap_us) AS hi
    FROM g WHERE gap_us IS NOT NULL
    """
    r = spark.sql(sql).collect()[0]
    # accuracy=10000 -> rank error <= n/10000; bound loosely by value range
    assert abs(r["approx_p50"] - r["exact_p50"]) <= 0.01 * (r["hi"] - r["lo"])


def test_gap_percentiles_match_numpy_on_random_sessions(spark):
    """Random gap populations (seeded, one Spark run): the shared-SQL
    interpolation equals numpy.percentile(method='linear') per session."""
    import random

    rng = random.Random(20260817)
    rows, truth = [], {}
    for conv in range(25):
        n = rng.randrange(1, 40)
        gaps = [rng.randrange(1, 10_000_000) for _ in range(n)]
        ts, acc = [], 0
        for g in [0] + gaps:
            acc += g
            ts.append(acc)
        for i, t in enumerate(ts):
            rows.append((f"c{conv}", i, 1_700_000_000_000_000 + t))
        truth[f"c{conv}"] = tuple(
            float(np.percentile(gaps, p, method="linear")) / 1e6
            for p in (50, 90, 99)
        )
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_us long")
    sql = """
    WITH g AS (
      SELECT conv_id, 1 AS session_id,
             ts_us - lag(ts_us) OVER (PARTITION BY conv_id ORDER BY ts_us, turn_idx) AS gap_us
      FROM rand_turns_v
    ),
    r AS (
      SELECT conv_id, session_id, gap_us,
             cast(row_number() OVER (PARTITION BY conv_id, session_id ORDER BY gap_us) AS bigint) - 1 AS rk,
             cast(count(*) OVER (PARTITION BY conv_id, session_id) AS bigint) AS n
      FROM g WHERE gap_us IS NOT NULL
    ),
    agg AS (
      SELECT conv_id, session_id, min(n) AS n,
        max(CASE WHEN rk = cast(floor((n-1)*0.5) AS bigint) THEN gap_us END) AS lo_p50,
        max(CASE WHEN rk = least(cast(floor((n-1)*0.5) AS bigint) + 1, n - 1) THEN gap_us END) AS hi_p50,
        max(CASE WHEN rk = cast(floor((n-1)*0.9) AS bigint) THEN gap_us END) AS lo_p90,
        max(CASE WHEN rk = least(cast(floor((n-1)*0.9) AS bigint) + 1, n - 1) THEN gap_us END) AS hi_p90,
        max(CASE WHEN rk = cast(floor((n-1)*0.99) AS bigint) THEN gap_us END) AS lo_p99,
        max(CASE WHEN rk = least(cast(floor((n-1)*0.99) AS bigint) + 1, n - 1) THEN gap_us END) AS hi_p99
      FROM r GROUP BY conv_id, session_id
    )
    SELECT conv_id,
      (cast(lo_p50 AS double) + (cast(hi_p50 AS double) - cast(lo_p50 AS double)) * ((n-1)*0.5 - floor((n-1)*0.5)))/1e6 AS p50,
      (cast(lo_p90 AS double) + (cast(hi_p90 AS double) - cast(lo_p90 AS double)) * ((n-1)*0.9 - floor((n-1)*0.9)))/1e6 AS p90,
      (cast(lo_p99 AS double) + (cast(hi_p99 AS double) - cast(lo_p99 AS double)) * ((n-1)*0.99 - floor((n-1)*0.99)))/1e6 AS p99
    FROM agg
    """
    df.createOrReplaceTempView("rand_turns_v")
    got = {
        r["conv_id"]: (r["p50"], r["p90"], r["p99"])
        for r in spark.sql(sql).collect()
    }
    assert got.keys() == truth.keys()
    for conv, vals in truth.items():
        np.testing.assert_allclose(got[conv], vals, rtol=1e-12, atol=1e-9)
