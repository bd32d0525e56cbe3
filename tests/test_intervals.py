"""Interval coalescing (intervals.py): brute-force sweep parity, closed-
interval touching semantics, global two-level == per-partition-free single
merge. The driver gate pins cross-engine hash-exactness via merge_intervals."""

from __future__ import annotations

import random

import pytest

from flow_feature_spark.intervals import merge_intervals


def _brute(ivs):
    """Reference merge: closed intervals, touching endpoints merge."""
    islands = []
    for s, e in sorted(ivs):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
            islands[-1][3] += e - s
        else:
            islands.append([s, e, 1, e - s])
    return [
        (i + 1, s, e, n, ln) for i, (s, e, n, ln) in enumerate(islands)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "e string, s long, t long")


def test_merge_matches_brute_force_per_entity_randomized(spark):
    rng = random.Random(13)
    rows = []
    for _ in range(500):
        e = f"e{rng.randrange(5)}"
        s = rng.randrange(0, 10_000)
        rows.append((e, s, s + rng.randrange(0, 400)))
    out = merge_intervals(_df(spark, rows), "s", "t", entity_col="e").collect()
    got = {}
    for r in out:
        got.setdefault(r["e"], []).append(
            (r["island_id"], r["start_us"], r["end_us"], r["n_intervals"], r["len_sum_us"])
        )
    per = {}
    for e, s, t in rows:
        per.setdefault(e, []).append((s, t))
    for e, ivs in per.items():
        assert sorted(got[e]) == _brute(ivs), e


def test_touching_endpoints_merge_and_disjoint_stay_apart(spark):
    rows = [("a", 0, 10), ("a", 10, 20), ("a", 21, 30)]
    out = sorted(
        merge_intervals(_df(spark, rows), "s", "t", entity_col="e").collect(),
        key=lambda r: r["island_id"],
    )
    assert [(r["start_us"], r["end_us"], r["n_intervals"]) for r in out] == [
        (0, 20, 2), (21, 30, 1),
    ]


def test_contained_interval_does_not_split_island(spark):
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 90, 200)]
    out = merge_intervals(_df(spark, rows), "s", "t", entity_col="e").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["start_us"], r["end_us"], r["n_intervals"], r["len_sum_us"]) == (
        0, 200, 3, 100 + 10 + 110,
    )


def test_global_two_level_equals_single_entity_merge_randomized(spark):
    rng = random.Random(29)
    rows = []
    for _ in range(600):
        s = rng.randrange(0, 500_000)
        rows.append(("x", s, s + rng.randrange(0, 30_000)))
    df = _df(spark, rows)
    # per-entity path with one entity == a single global window merge
    single = sorted(
        (r["island_id"], r["start_us"], r["end_us"], r["n_intervals"], r["len_sum_us"])
        for r in merge_intervals(df, "s", "t", entity_col="e").collect()
    )
    # two-level path with buckets small enough that islands really do span
    two = sorted(
        (r["island_id"], r["start_us"], r["end_us"], r["n_intervals"], r["len_sum_us"])
        for r in merge_intervals(
            df, "s", "t", entity_col=None, global_bucket_us=10_000
        ).collect()
    )
    assert two == single


def test_null_and_inverted_bounds_rejected(spark):
    with pytest.raises(Exception, match="inverted"):
        merge_intervals(
            _df(spark, [("a", 10, 5)]), "s", "t", entity_col="e"
        ).collect()
    df = spark.createDataFrame([("a", None, 5)], "e string, s long, t long")
    with pytest.raises(Exception, match="NULL"):
        merge_intervals(df, "s", "t", entity_col="e").collect()
