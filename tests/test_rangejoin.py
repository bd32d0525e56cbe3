"""Interval (range) join: bucketized path vs the naive non-equi oracle,
boundary semantics, the explode-budget wall, and the no-cartesian plan
guarantee (rangejoin.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from flow_feature_spark.rangejoin import (
    interval_join_bucketed,
    interval_join_naive,
)


def _frames(spark, with_entity=True):
    iv_rows = [
        # (entity, start, end, tag)
        ("a", 100, 200, "a1"),
        ("a", 150, 300, "a2"),  # overlaps a1: probes in [150,200] match both
        ("a", 500, 500, "a3"),  # degenerate point interval
        ("b", 0, 1000, "b1"),
        ("b", 2000, 1500, "bad"),  # end < start: matches nothing
    ]
    pr_rows = [
        ("a", 99), ("a", 100), ("a", 175), ("a", 200), ("a", 201),
        ("a", 500), ("b", 0), ("b", 1000), ("b", 1750), ("a", 1000),
    ]
    iv = spark.createDataFrame(
        iv_rows, "entity_id string, start_us long, end_us long, tag string"
    )
    pr = spark.createDataFrame(pr_rows, "entity_id string, ts_us long")
    if not with_entity:
        iv = iv.drop("entity_id")
        pr = pr.drop("entity_id").distinct()
    return iv, pr


def _pairs(df):
    return sorted((r["ts_us"], r["tag"]) for r in df.collect())


def test_bucketed_matches_naive_with_entity(spark):
    iv, pr = _frames(spark)
    for bucket_us in (7, 100, 1000, 10_000):  # bucket width must not matter
        got = _pairs(interval_join_bucketed(iv, pr, bucket_us=bucket_us))
        want = _pairs(interval_join_naive(iv, pr))
        assert got == want, f"bucket_us={bucket_us}"
    # boundary semantics pinned: inclusive both ends, bad interval inert
    assert (100, "a1") in got and (200, "a1") in got and (99, "a1") not in got
    assert (500, "a3") in got
    assert all(tag != "bad" for _, tag in got)


def test_bucketed_matches_naive_keyless(spark):
    """Pure range join (no equi key) — every probe vs every interval."""
    iv, pr = _frames(spark, with_entity=False)
    got = _pairs(interval_join_bucketed(iv, pr, entity_cols=(), bucket_us=64))
    want = _pairs(interval_join_naive(iv, pr, entity_cols=()))
    assert got == want
    # cross-entity matches now exist (probe 175 hits b1 too)
    assert (175, "b1") in got


def test_no_duplicate_pairs_across_buckets(spark):
    """An interval spanning many buckets must still emit each pair once."""
    iv = spark.createDataFrame(
        [("a", 0, 10_000, "wide")],
        "entity_id string, start_us long, end_us long, tag string",
    )
    pr = spark.createDataFrame(
        [("a", t) for t in range(0, 10_001, 500)], "entity_id string, ts_us long"
    )
    out = interval_join_bucketed(iv, pr, bucket_us=100)
    assert out.count() == 21 == out.distinct().count()


def test_span_wall_raises(spark):
    iv = spark.createDataFrame(
        [("a", 0, 10_000, "wide")],
        "entity_id string, start_us long, end_us long, tag string",
    )
    pr = spark.createDataFrame([("a", 5)], "entity_id string, ts_us long")
    out = interval_join_bucketed(iv, pr, bucket_us=10, max_interval_buckets=100)
    with pytest.raises(Exception, match="max_interval_buckets"):
        out.collect()


def test_bucketed_plan_is_equi_join(spark):
    """The scale guarantee: the bucketized path plans a shuffled/broadcast
    HASH join on (entity, bucket) — never a nested-loop/cartesian scan."""
    iv, pr = _frames(spark)
    plan = interval_join_bucketed(iv, pr, bucket_us=100)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    iv2, pr2 = _frames(spark, with_entity=False)
    plan2 = interval_join_bucketed(iv2, pr2, entity_cols=(), bucket_us=100)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan2 and "Cartesian" not in plan2


def _iv2(spark, rows, side):
    pre = "l" if side == "l" else "r"
    return spark.createDataFrame(
        rows, f"{pre}_id long, {pre}_start_us long, {pre}_end_us long"
    )


def test_overlap_matches_bruteforce(spark):
    from flow_feature_spark.rangejoin import overlap_join_bucketed

    left = _iv2(spark, [(1, 0, 100), (2, 50, 60), (3, 200, 300), (4, 400, 400)], "l")
    right = _iv2(spark, [(10, 90, 250), (11, 300, 400), (12, 55, 58), (13, 500, 600)], "r")
    for bucket_us in (7, 30, 1000):
        got = sorted(
            (r["l_id"], r["r_id"])
            for r in overlap_join_bucketed(left, right, bucket_us=bucket_us).collect()
        )
        assert got == [(1, 10), (1, 12), (2, 12), (3, 10), (3, 11), (4, 11)], bucket_us


def test_overlap_no_duplicates_on_long_overlap(spark):
    """Two intervals sharing 100 buckets must emit their pair exactly once
    (responsibility rule: the bucket holding max(starts) emits)."""
    from flow_feature_spark.rangejoin import overlap_join_bucketed

    left = _iv2(spark, [(1, 0, 10_000)], "l")
    right = _iv2(spark, [(2, 500, 9_000)], "r")
    out = overlap_join_bucketed(left, right, bucket_us=100)
    assert out.count() == 1


def test_overlap_plan_is_equi_join(spark):
    from flow_feature_spark.rangejoin import overlap_join_bucketed

    left = _iv2(spark, [(1, 0, 100)], "l")
    right = _iv2(spark, [(2, 50, 60)], "r")
    plan = (
        overlap_join_bucketed(left, right, bucket_us=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_randomized_interval_and_overlap_vs_python_bruteforce(spark):
    """300 random intervals x 500 random probes (seeded), both joins checked
    pair-for-pair against a pure-Python brute force in one Spark run."""
    import random

    rng = random.Random(20260817)
    ivs = []
    for i in range(300):
        s = rng.randrange(0, 50_000)
        ivs.append((f"e{rng.randrange(5)}", s, s + rng.randrange(0, 3_000), i))
    prs = [(f"e{rng.randrange(5)}", rng.randrange(0, 55_000)) for _ in range(500)]
    iv = spark.createDataFrame(ivs, "entity_id string, start_us long, end_us long, tag long")
    pr = spark.createDataFrame(prs, "entity_id string, ts_us long").distinct()

    want = sorted(
        (e, t, tag)
        for (e, t) in {(e, t) for e, t in prs}
        for (ie, s, en, tag) in ivs
        if ie == e and s <= t <= en
    )
    got = sorted(
        (r["entity_id"], r["ts_us"], r["tag"])
        for r in interval_join_bucketed(iv, pr, bucket_us=777).collect()
    )
    assert got == want

    from flow_feature_spark.rangejoin import overlap_join_bucketed

    left = iv.selectExpr("entity_id", "start_us AS l_start_us",
                         "end_us AS l_end_us", "tag AS l_tag")
    right = iv.selectExpr("entity_id AS r_entity", "start_us AS r_start_us",
                          "end_us AS r_end_us", "tag AS r_tag")
    right = right.withColumnRenamed("r_entity", "entity_id")
    want_ov = sorted(
        (a[3], b[3])
        for a in ivs for b in ivs
        if a[0] == b[0] and a[1] <= b[2] and b[1] <= a[2]
    )
    got_ov = sorted(
        (r["l_tag"], r["r_tag"])
        for r in overlap_join_bucketed(
            left, right, entity_cols=("entity_id",), bucket_us=777
        ).collect()
    )
    assert got_ov == want_ov
