"""Behavioral analytics (analytics.py): ordered funnel + cohort retention.

Semantics pinned on hand-built frames (the driver gate pins cross-engine
hash-exactness separately via funnel_steps / cohort_retention)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from flow_feature_spark.analytics import cohort_retention, funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, d, h, m)) for (u, t, d, h, m) in rows],
        "user_id string, event_type string, ts timestamp",
    )


def test_funnel_strictly_after_ordering(spark):
    ev = _ev(spark, [
        # u1: full ordered funnel
        ("u1", "view", 1, 9, 0), ("u1", "click", 1, 10, 0),
        ("u1", "purchase", 1, 11, 0),
        # u2: click BEFORE the first view -> stops at view
        ("u2", "click", 1, 8, 0), ("u2", "view", 1, 9, 0),
        # u3: view+purchase but no click -> stops at view
        ("u3", "view", 1, 9, 0), ("u3", "purchase", 1, 10, 0),
        # u4: never views
        ("u4", "click", 1, 9, 0),
    ])
    got = {r["step"]: (r["n_users"], r["conv_rate"])
           for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert got == {
        "view": (3, 1.0),
        "click": (1, pytest.approx(1 / 3, abs=1e-6)),
        "purchase": (1, 1.0),
    }


def test_funnel_same_timestamp_not_after(spark):
    """Strictly-after: a click at the exact view timestamp does not count."""
    ev = _ev(spark, [("u1", "view", 1, 9, 0), ("u1", "click", 1, 9, 0)])
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 0}


def test_funnel_conversion_window(spark):
    ev = _ev(spark, [
        ("u1", "view", 1, 9, 0), ("u1", "click", 1, 9, 30),   # 30 min later
        ("u2", "view", 1, 9, 0), ("u2", "click", 1, 11, 0),   # 2 h later
    ])
    tight = {r["step"]: r["n_users"] for r in funnel_counts(
        ev, ["view", "click"], max_step_gap_seconds=3600.0).collect()}
    loose = {r["step"]: r["n_users"] for r in funnel_counts(
        ev, ["view", "click"], max_step_gap_seconds=7200.0).collect()}
    assert tight == {"view": 2, "click": 1}
    assert loose == {"view": 2, "click": 2}


def test_funnel_uses_earliest_qualifying_not_any(spark):
    """Step i+1 anchors on step i's FIRST qualifying event: u1's click is
    within the window of the first view even though a later view exists."""
    ev = _ev(spark, [
        ("u1", "view", 1, 9, 0), ("u1", "view", 1, 12, 0),
        ("u1", "click", 1, 9, 45),
    ])
    got = {r["step"]: r["n_users"] for r in funnel_counts(
        ev, ["view", "click"], max_step_gap_seconds=3600.0).collect()}
    assert got == {"view": 1, "click": 1}


def test_funnel_empty_steps_raises(spark):
    with pytest.raises(ValueError, match="at least one step"):
        funnel_counts(_ev(spark, [("u1", "view", 1, 9, 0)]), [])


def test_cohort_retention_grid(spark):
    ev = _ev(spark, [
        # cohort Jan 1: u1 active day 0, 1, 3; u2 active day 0 only
        ("u1", "view", 1, 9, 0), ("u1", "view", 2, 9, 0), ("u1", "view", 4, 9, 0),
        ("u2", "view", 1, 12, 0),
        # cohort Jan 2: u3 active day 0 and 1 (two events on day 0 dedupe)
        ("u3", "view", 2, 9, 0), ("u3", "click", 2, 10, 0), ("u3", "view", 3, 9, 0),
    ])
    got = {(str(r["cohort_day"]), r["day_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }
    capped = cohort_retention(ev, max_offset_days=1).collect()
    assert all(r["day_offset"] <= 1 for r in capped) and len(capped) == 4


def test_funnel_single_exchange_plan(spark):
    """The chained-window formulation must plan ONE exchange for the whole
    step chain (the join-per-step formulation would shuffle k times)."""
    ev = _ev(spark, [("u1", "view", 1, 9, 0), ("u1", "click", 1, 10, 0)])
    import re

    plan = (
        funnel_counts(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_user_exchanges = len(re.findall(r"hashpartitioning\(__user", plan))
    assert n_user_exchanges <= 1, plan[:1500]


def test_transition_counts_matrix(spark):
    from flow_feature_spark.analytics import transition_counts

    ev = _ev(spark, [
        ("u1", "a", 1, 9, 0), ("u1", "b", 1, 9, 1), ("u1", "a", 1, 9, 2),
        ("u1", "b", 1, 9, 3),
        ("u2", "a", 1, 9, 0), ("u2", "b", 1, 9, 1),
    ])
    got = {(r["from_type"], r["to_type"]): r["n_transitions"]
           for r in transition_counts(ev).collect()}
    # u1: a->b, b->a, a->b; u2: a->b — never a cross-user transition
    assert got == {("a", "b"): 3, ("b", "a"): 1}
    norm = {(r["from_type"], r["to_type"]): r["p"]
            for r in transition_counts(ev, normalize=True).collect()}
    assert norm[("a", "b")] == 1.0 and norm[("b", "a")] == 1.0


def test_transition_counts_order_cols_break_ties(spark):
    from pyspark.sql import functions as F

    from flow_feature_spark.analytics import transition_counts

    ev = _ev(spark, [
        ("u1", "x", 1, 9, 0), ("u1", "y", 1, 9, 0),  # same timestamp
    ]).withColumn("seq", F.when(F.col("event_type") == "x", 0).otherwise(1))
    got = {(r["from_type"], r["to_type"]): r["n_transitions"]
           for r in transition_counts(ev, order_cols=("seq",)).collect()}
    assert got == {("x", "y"): 1}


def test_histogram_drift_identical_halves_zero(spark):
    """Identical ref/cur distributions -> every chi-square term 0."""
    from flow_feature_spark.analytics import histogram_drift

    rows = [(i, float((i // 2) % 10) * 10.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, v double")
    out = histogram_drift(df, "v", "event_id % 2 = 0", n_bins=10, lo=0.0, hi=100.0)
    got = out.collect()
    assert len(got) == 10
    assert all(r["chi2_term"] == 0.0 and r["n_ref"] == r["n_cur"] for r in got)


def test_histogram_drift_under_overflow_and_shift(spark):
    from flow_feature_spark.analytics import histogram_drift

    rows = ([(i, -5.0) for i in range(0, 10, 2)]          # ref underflow
            + [(i, 500.0) for i in range(1, 11, 2)]       # cur overflow
            + [(i, 50.0) for i in range(20, 40)])         # both, bin 5
    df = spark.createDataFrame(rows, "event_id long, v double")
    out = {r["bin_idx"]: r for r in histogram_drift(
        df, "v", "event_id % 2 = 0", n_bins=10, lo=0.0, hi=100.0).collect()}
    assert out[-1]["n_ref"] == 5 and out[-1]["n_cur"] == 0
    assert out[10]["n_ref"] == 0 and out[10]["n_cur"] == 5
    # n_ref = 0 -> term undefined, NULL (never a silent 0)
    assert out[10]["chi2_term"] is None
    assert out[5]["n_ref"] == 10 and out[5]["n_cur"] == 10


def test_histogram_drift_validates_params(spark):
    import pytest as _pytest

    from flow_feature_spark.analytics import histogram_drift

    df = spark.createDataFrame([(1, 1.0)], "event_id long, v double")
    with _pytest.raises(ValueError):
        histogram_drift(df, "v", "event_id % 2 = 0", n_bins=0)
    with _pytest.raises(ValueError):
        histogram_drift(df, "v", "event_id % 2 = 0", lo=5.0, hi=5.0)


def test_randomized_brute_force_against_python_oracle(spark):
    """Seeded random corpus vs straight-line Python implementations of all
    three sequence operators (the randomized-oracle pattern of
    test_rangejoin): funnel with conversion window, transition counts, and
    cohort retention must all match exactly."""
    import random
    from collections import Counter, defaultdict
    from datetime import datetime, timedelta

    from flow_feature_spark.analytics import (
        cohort_retention,
        funnel_counts,
        transition_counts,
    )

    rng = random.Random(20260817)
    types = ["view", "click", "purchase", "error"]
    base = datetime(2024, 1, 1)
    rows = []
    for u in range(120):
        for i in range(rng.randint(0, 25)):
            rows.append((
                f"u{u}",
                rng.choice(types),
                base + timedelta(minutes=rng.randint(0, 60 * 24 * 20)),
                u * 1000 + i,
            ))
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp, event_id long"
    )
    steps, gap_s = ["view", "click", "purchase"], 86400.0

    # ---- python funnel oracle
    by_user = defaultdict(list)
    for u, t, ts, eid in rows:
        by_user[u].append((ts, eid, t))
    reach = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        for si, step in enumerate(steps):
            cand = [
                ts for ts, _, t in evs
                if t == step and (
                    si == 0
                    or (t_prev is not None and ts > t_prev
                        and (ts - t_prev).total_seconds() <= gap_s)
                )
            ]
            if si > 0 and t_prev is None:
                cand = []
            if not cand:
                break
            t_prev = min(cand)
            reach[si] += 1
    got = {r["step_idx"]: r["n_users"] for r in funnel_counts(
        ev, steps, max_step_gap_seconds=gap_s).collect()}
    assert got == {i: reach[i] for i in range(len(steps))}

    # ---- python transition oracle ((ts, event_id) ordering)
    want_tc = Counter()
    for evs in by_user.values():
        seq = [t for _, _, t in sorted(evs)]
        for a, b in zip(seq, seq[1:]):
            want_tc[(a, b)] += 1
    got_tc = {(r["from_type"], r["to_type"]): r["n_transitions"]
              for r in transition_counts(ev, order_cols=("event_id",)).collect()}
    assert got_tc == dict(want_tc)

    # ---- python cohort oracle
    want_cr = Counter()
    for evs in by_user.values():
        days = sorted({ts.date() for ts, _, _ in evs})
        for d in days:
            want_cr[(days[0], (d - days[0]).days)] += 1
    got_cr = {(r["cohort_day"], r["day_offset"]): r["n_users"]
              for r in cohort_retention(ev).collect()}
    assert got_cr == dict(want_cr)


def test_histogram_drift_null_values_get_null_bin(spark):
    """NULL values are missing data, not underflow: they land in a dedicated
    NULL-bin row instead of being silently clamped into bin -1 (Spark's
    NULL-skipping greatest would do that; DuckDB's pre-1.1 NULL-propagating
    greatest would then disagree — explicit handling keeps both engines
    deterministic and in agreement)."""
    from flow_feature_spark.analytics import histogram_drift

    rows = ([(0, None), (2, None), (4, 50.0), (6, 50.0)]      # ref: 2 NULL
            + [(1, None), (3, 50.0), (5, 50.0), (7, -5.0)])   # cur: 1 NULL
    df = spark.createDataFrame(rows, "event_id long, v double")
    out = {r["bin_idx"]: r for r in histogram_drift(
        df, "v", "event_id % 2 = 0", n_bins=10, lo=0.0, hi=100.0).collect()}
    assert out[None]["n_ref"] == 2 and out[None]["n_cur"] == 1
    # the underflow bin holds only the genuine -5.0, never the NULLs
    assert out[-1]["n_ref"] == 0 and out[-1]["n_cur"] == 1
    assert out[5]["n_ref"] == 2 and out[5]["n_cur"] == 2


def test_cohort_retention_approx_twin(spark):
    """The 10^12-row scale twin: exact_distinct=False swaps the per-cell
    COUNT(DISTINCT) for an HLL sketch whose counts stay within tolerance of
    the exact grid on every (cohort, offset) cell, with the grid keys
    themselves identical."""
    from flow_feature_spark.analytics import cohort_retention

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = {(r["cohort_day"], r["day_offset"]): r["n_users"]
             for r in cohort_retention(ev).collect()}
    approx = {(r["cohort_day"], r["day_offset"]): r["n_users"]
              for r in cohort_retention(ev, exact_distinct=False).collect()}
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.15 * n), (k, n, approx[k])


def test_funnel_reanchored_counts_reentry(spark):
    """The re-entry case funnel_counts undercounts by design: u1's first
    view's window expires but a second view converts. funnel_reanchored
    counts it; greedy does not. Ties (u5's click at the view's exact ts)
    stay strictly-after on both."""
    from flow_feature_spark.analytics import funnel_counts, funnel_reanchored

    rows = [
        ("u1", "view", 0), ("u1", "view", 150), ("u1", "click", 200),
        ("u1", "purchase", 240),
        ("u2", "view", 0), ("u2", "click", 10), ("u2", "purchase", 20),
        ("u3", "view", 5),
        ("u4", "click", 1), ("u4", "purchase", 2), ("u4", "view", 3),
        ("u5", "view", 50), ("u5", "click", 50), ("u5", "click", 60),
    ]
    ev = spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1) + timedelta(seconds=s))
         for u, t, s in rows],
        "user_id string, event_type string, ts timestamp",
    )
    steps = ["view", "click", "purchase"]
    re = {r["step"]: r["n_users"]
          for r in funnel_reanchored(ev, steps,
                                     conversion_window_seconds=100.0).collect()}
    greedy = {r["step"]: r["n_users"]
              for r in funnel_counts(ev, steps,
                                     max_step_gap_seconds=100.0).collect()}
    assert re == {"view": 5, "click": 3, "purchase": 2}
    assert greedy == {"view": 5, "click": 2, "purchase": 1}


def test_funnel_reanchored_randomized_any_chain_oracle(spark):
    """Randomized corpus vs a TRUE any-chain brute force (DFS over every
    strictly-increasing chain within the per-anchor window) — validates the
    greedy-dominance argument the engine relies on, not just the greedy
    implementation against itself."""
    import random
    from collections import defaultdict

    from flow_feature_spark.analytics import funnel_reanchored

    rng = random.Random(20260818)
    steps, W = ["view", "click", "purchase"], 3600.0 * 6
    types = steps + ["error"]
    base = datetime(2024, 1, 1)
    rows = []
    for u in range(100):
        for _ in range(rng.randint(0, 30)):
            rows.append((
                f"u{u}",
                rng.choice(types),
                base + timedelta(minutes=rng.randint(0, 60 * 24 * 5)),
            ))
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp")

    by_user = defaultdict(lambda: defaultdict(list))
    for u, t, ts in rows:
        by_user[u][t].append(ts)
    reach = [0] * len(steps)
    for u, ebt in by_user.items():
        def depth(si, t, deadline):
            best = si
            if si + 1 < len(steps):
                for ts in ebt[steps[si + 1]]:
                    if t < ts <= deadline:
                        best = max(best, depth(si + 1, ts, deadline))
            return best
        best = -1
        for a in ebt[steps[0]]:
            best = max(best, depth(0, a, a + timedelta(seconds=W)))
        for i in range(best + 1):
            reach[i] += 1
    got = {r["step_idx"]: r["n_users"]
           for r in funnel_reanchored(ev, steps,
                                      conversion_window_seconds=W).collect()}
    assert got == {i: reach[i] for i in range(len(steps))}
    assert reach[1] > 0 and reach[2] > 0  # corpus actually exercises chains


def test_mad_outliers_match_numpy_brute_force(spark):
    """Median/MAD equal numpy's linear-interpolation median per group;
    flags equal the |v-med| > k*MAD rule."""
    import random

    import numpy as np

    from flow_feature_spark.analytics import mad_outlier_flags

    rng = random.Random(31)
    rows = []
    for i in range(500):
        g = f"g{rng.randrange(7)}"  # mixes odd/even group sizes
        rows.append((g, i, rng.uniform(-50, 50) if rng.random() > 0.05
                     else rng.uniform(500, 900)))
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = {r["i"]: (r["med"], r["mad"], r["is_outlier"])
           for r in mad_outlier_flags(df, ["g"], "v", k=3.0).collect()}
    per = {}
    for g, i, v in rows:
        per.setdefault(g, []).append(v)
    r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    for g, i, v in rows:
        vals = np.array(per[g])
        med = np.percentile(vals, 50)  # linear interpolation
        mad = np.percentile(np.abs(vals - med), 50)
        want = (r6(med), r6(mad), bool(abs(v - med) > 3.0 * mad))
        got = out[i]
        assert got[0] == pytest.approx(want[0], abs=1e-9), (g, i)
        assert got[1] == pytest.approx(want[1], abs=1e-9), (g, i)
        assert got[2] == want[2], (g, i, v, med, mad)


def test_mad_zero_group_flags_any_deviation_and_single_row(spark):
    from flow_feature_spark.analytics import mad_outlier_flags

    # >50% identical values -> MAD = 0 -> any deviation is an outlier
    rows = [("a", i, 5.0) for i in range(6)] + [("a", 10, 5.1), ("b", 20, 9.0)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = {r["i"]: r["is_outlier"] for r in
           mad_outlier_flags(df, ["g"], "v").collect()}
    assert out[10] is True and all(out[i] is False for i in range(6))
    assert out[20] is False  # single-row group: med=v, mad=0, dev=0
    with pytest.raises(ValueError):
        mad_outlier_flags(df, ["g"], "v", k=0)
