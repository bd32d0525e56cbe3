"""Multi-granularity time rollup: level algebra vs plain groupBy, exact
distinct semantics, and the approx_count_distinct scale twin (rollup.py)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from flow_feature_spark.rollup import time_rollup


def _events(spark, n=500, seed=7):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            f"u{rng.randrange(40)}",
            base + dt.timedelta(hours=rng.randrange(96), seconds=rng.randrange(3600)),
            "x" * rng.randrange(20),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "user_id string, ts timestamp, props string")


def test_rollup_levels_consistent(spark):
    ev = _events(spark)
    out = time_rollup(ev).collect()
    hour = [r for r in out if r["lvl"] == "hour"]
    day = [r for r in out if r["lvl"] == "day"]
    total = [r for r in out if r["lvl"] == "all"]
    assert len(total) == 1
    # additive measures roll up exactly across levels
    assert sum(r["n_events"] for r in hour) == total[0]["n_events"] == ev.count()
    assert sum(r["bytes_total"] for r in day) == total[0]["bytes_total"]
    by_day = {}
    for r in hour:
        by_day[r["bucket_day"]] = by_day.get(r["bucket_day"], 0) + r["n_events"]
    assert by_day == {r["bucket_day"]: r["n_events"] for r in day}


def test_rollup_hour_level_matches_plain_groupby(spark):
    ev = _events(spark)
    out = {
        (r["bucket_day"], r["bucket_hour"]): (r["n_events"], r["n_users"])
        for r in time_rollup(ev).collect()
        if r["lvl"] == "hour"
    }
    plain = {
        (r["d"], r["h"]): (r["n"], r["u"])
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("d"), F.hour("ts").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert out == plain


def test_rollup_distinct_is_exact_not_additive(spark):
    """n_users at the day level is a TRUE distinct over the day, not a sum of
    hourly distincts — the exactness property approx sketches must also keep
    (mergeability), pinned here against the naive additive mistake."""
    ev = _events(spark)
    out = time_rollup(ev).collect()
    day = {r["bucket_day"]: r["n_users"] for r in out if r["lvl"] == "day"}
    hour_sum = {}
    for r in out:
        if r["lvl"] == "hour":
            hour_sum[r["bucket_day"]] = hour_sum.get(r["bucket_day"], 0) + r["n_users"]
    # with 40 users over 4 days, some user hits >1 hour of the same day
    assert any(day[d] < hour_sum[d] for d in day)
    truth = {
        r["d"]: r["u"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert day == truth


def test_approx_distinct_scale_twin(spark):
    """The 100-TB path for A10/rollup distincts: HLL approx_count_distinct
    stays within its documented rsd of the exact count (here 5%)."""
    ev = _events(spark, n=4000, seed=11)
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.15 * row["exact"])


def test_pivot_counts_semantics(spark):
    import pytest as _pt

    from flow_feature_spark.rollup import pivot_counts

    df = spark.createDataFrame(
        [("u1", "a"), ("u1", "a"), ("u1", "b"), ("u2", "b"), ("u2", "zzz")],
        "uid string, kind string",
    )
    out = {
        r["uid"]: (r["n_a"], r["n_b"], r["n_total"])
        for r in pivot_counts(df, "uid", "kind", values=["a", "b"]).collect()
    }
    # missing category -> 0 (not null); unlisted 'zzz' still counts in total
    assert out == {"u1": (2, 1, 3), "u2": (0, 1, 2)}
    with _pt.raises(ValueError, match="explicit values"):
        pivot_counts(df, "uid", "kind")


def test_hopping_window_membership_and_counts(spark):
    """Each event lands in exactly size/slide slide-aligned windows; counts
    and byte sums agree with a straight-line Python replay."""
    from collections import Counter
    from datetime import datetime

    from flow_feature_spark.rollup import hopping_window_counts

    rows = [
        (1, "u1", datetime(2024, 1, 1, 0, 7), "abc"),
        (2, "u2", datetime(2024, 1, 1, 0, 20), "de"),
        (3, "u1", datetime(2024, 1, 1, 3, 59), "fghi"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, props string"
    )
    got = {r["win_start_us"]: (r["n_events"], r["n_users"], r["bytes_total"])
           for r in hopping_window_counts(
               df, size="1 hour", slide="15 minutes").collect()}
    size_us, slide_us = 3_600_000_000, 900_000_000
    n = size_us // slide_us
    cnt, users, bts = Counter(), {}, Counter()
    for _, u, ts, props in rows:
        ts_us = int(ts.timestamp() * 1e6)
        for i in range(n):
            ws = slide_us * (ts_us // slide_us - i)
            cnt[ws] += 1
            users.setdefault(ws, set()).add(u)
            bts[ws] += len(props)
    want = {ws: (cnt[ws], len(users[ws]), bts[ws]) for ws in cnt}
    assert got == want
    # every event is in exactly n windows
    assert sum(v[0] for v in got.values()) == len(rows) * n


def test_hopping_window_approx_twin(spark):
    """Hopping-window scale twin: exact_distinct=False keeps the exact
    window grid and exact n_events/bytes_total while n_users becomes an HLL
    estimate within tolerance per window."""
    from flow_feature_spark.rollup import hopping_window_counts

    ev = _events(spark, n=4000, seed=11)
    exact = {r["win_start_us"]: r for r in hopping_window_counts(ev).collect()}
    approx = {r["win_start_us"]: r
              for r in hopping_window_counts(ev, exact_distinct=False).collect()}
    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        assert (a["n_events"], a["bytes_total"], a["win_end_us"]) == (
            e["n_events"], e["bytes_total"], e["win_end_us"])
        assert abs(a["n_users"] - e["n_users"]) <= max(3, 0.15 * e["n_users"])


def test_unpivot_roundtrips_pivot_and_expands_mapside(spark):
    """melt(pivot(df)) == the direct long counts, zero cells included; the
    melt itself is an Expand (no exchange added past the pivot's agg)."""
    from pyspark.sql import functions as F

    from flow_feature_spark.rollup import pivot_counts, unpivot_counts

    rows = [("u1", "a"), ("u1", "a"), ("u1", "b"), ("u2", "b"), ("u3", "c")]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    wide = pivot_counts(df, "user_id", "event_type", values=["a", "b"])
    long = unpivot_counts(wide, ["user_id"], ["n_a", "n_b", "n_total"])
    got = {(r["user_id"], r["category"]): r["n"] for r in long.collect()}
    assert got == {
        ("u1", "n_a"): 2, ("u1", "n_b"): 1, ("u1", "n_total"): 3,
        ("u2", "n_a"): 0, ("u2", "n_b"): 1, ("u2", "n_total"): 1,
        ("u3", "n_a"): 0, ("u3", "n_b"): 0, ("u3", "n_total"): 1,  # unlisted 'c' counts in total
    }
    plan = long._sc._jvm.PythonSQLUtils.explainString(
        long._jdf.queryExecution(), "simple")
    # AQE's final explain repeats the plan (Final + Initial) — inspect the
    # executed section only
    final = plan.split("== Initial Plan ==")[0]
    assert "Expand" in final
    # melt adds no exchange beyond the pivot aggregate's single shuffle
    assert final.count("Exchange hashpartitioning") == 1


def test_unpivot_rejects_missing_and_empty_columns(spark):
    import pytest as _pytest

    from flow_feature_spark.rollup import unpivot_counts

    df = spark.createDataFrame([("u", 1)], "user_id string, n_a long")
    with _pytest.raises(ValueError, match="missing"):
        unpivot_counts(df, ["user_id"], ["n_zz"])
    with _pytest.raises(ValueError, match="at least one"):
        unpivot_counts(df, ["user_id"], [])
