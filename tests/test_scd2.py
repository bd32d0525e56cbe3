"""SCD2 dimension-history build (featurestore.build_scd2): brute-force run
compression on randomized changelogs, null-safe change detection, revert
(A->B->A) non-merging, deterministic duplicate-ts ordering. Driver gate
pins cross-engine hash-exactness via scd2_build."""

from __future__ import annotations

import random

import pytest

from flow_feature_spark.featurestore import build_scd2


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts_us long, v string, seq long"
    )


def _brute(rows):
    """(k, v, valid_from, valid_to) runs per key, ordered by (ts, seq)."""
    per = {}
    for k, ts, v, seq in rows:
        per.setdefault(k, []).append((ts, seq, v))
    out = []
    for k, evs in per.items():
        evs.sort()
        runs = []
        for ts, _seq, v in evs:
            if not runs or runs[-1][0] != v:
                runs.append([v, ts])
        for i, (v, frm) in enumerate(runs):
            to = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((k, v, frm, to))
    return sorted(out, key=lambda x: (x[0], x[2], str(x[1])))


def test_scd2_matches_brute_force_randomized(spark):
    rng = random.Random(3)
    rows = []
    for i in range(600):
        rows.append((
            f"k{rng.randrange(8)}",
            rng.randrange(0, 200),
            rng.choice(["A", "B", "C", None]),
            i,
        ))
    # de-duplicate (k, ts) so ordering is unambiguous for the brute force
    seen = set()
    uniq = []
    for k, ts, v, seq in rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.append((k, ts, v, seq))
    got = sorted(
        (
            (r["k"], r["v"], r["valid_from_us"], r["valid_to_us"])
            for r in build_scd2(
                _df(spark, uniq), ["k"], "ts_us", ["v"], tiebreak_cols=["seq"]
            ).collect()
        ),
        key=lambda x: (x[0], x[2], str(x[1])),
    )
    assert got == _brute(uniq)


def test_scd2_null_safe_change_detection(spark):
    rows = [
        ("k", 0, None, 0), ("k", 1, None, 1),  # NULL -> NULL: no change
        ("k", 2, "A", 2),                       # NULL -> A: change
        ("k", 3, None, 3),                      # A -> NULL: change
    ]
    out = build_scd2(_df(spark, rows), ["k"], "ts_us", ["v"]).orderBy(
        "valid_from_us"
    ).collect()
    assert [(r["v"], r["valid_from_us"], r["valid_to_us"]) for r in out] == [
        (None, 0, 2), ("A", 2, 3), (None, 3, None),
    ]


def test_scd2_revert_produces_three_intervals(spark):
    rows = [("k", 0, "A", 0), ("k", 1, "B", 1), ("k", 2, "A", 2)]
    out = build_scd2(_df(spark, rows), ["k"], "ts_us", ["v"]).orderBy(
        "valid_from_us"
    ).collect()
    assert [(r["v"], r["valid_from_us"], r["valid_to_us"]) for r in out] == [
        ("A", 0, 1), ("B", 1, 2), ("A", 2, None),
    ]


def test_scd2_duplicate_ts_ordered_by_tiebreak(spark):
    rows = [("k", 5, "B", 1), ("k", 5, "A", 0), ("k", 9, "B", 2)]
    from pyspark.sql import functions as F

    out = build_scd2(
        _df(spark, rows), ["k"], "ts_us", ["v"], tiebreak_cols=["seq"]
    ).orderBy("valid_from_us", F.col("valid_to_us").asc_nulls_last()).collect()
    # order: A(seq0) then B(seq1) at ts 5, B at 9 continues the run
    assert [(r["v"], r["valid_from_us"], r["valid_to_us"]) for r in out] == [
        ("A", 5, 5), ("B", 5, None),
    ]


def test_scd2_multi_attribute_any_change_opens_run(spark):
    df = spark.createDataFrame(
        [("k", 0, "A", 1), ("k", 1, "A", 2), ("k", 2, "B", 2)],
        "k string, ts_us long, v string, w long",
    )
    out = build_scd2(df, ["k"], "ts_us", ["v", "w"]).orderBy("valid_from_us").collect()
    assert [(r["v"], r["w"], r["valid_from_us"], r["valid_to_us"]) for r in out] == [
        ("A", 1, 0, 1), ("A", 2, 1, 2), ("B", 2, 2, None),
    ]


def test_scd2_requires_keys_and_attrs(spark):
    df = _df(spark, [("k", 0, "A", 0)])
    with pytest.raises(ValueError):
        build_scd2(df, [], "ts_us", ["v"])
    with pytest.raises(ValueError):
        build_scd2(df, ["k"], "ts_us", [])
