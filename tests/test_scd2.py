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


def test_attach_scd2_matches_interval_lookup_randomized(spark):
    """attach_scd2(probes, build_scd2(changelog)) == brute-force 'value of
    the run containing t' (valid_from <= t < valid_to), probes before the
    first run get NULLs, probe rows never drop."""
    from flow_feature_spark.featurestore import attach_scd2, build_scd2

    rng = random.Random(17)
    rows, seen = [], set()
    for i in range(400):
        k, ts = f"k{rng.randrange(6)}", rng.randrange(0, 300)
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        rows.append((k, ts, rng.choice(["A", "B", "C"]), i))
    dim = build_scd2(_df(spark, rows), ["k"], "ts_us", ["v"],
                     tiebreak_cols=["seq"])
    probes = spark.createDataFrame(
        [(f"k{rng.randrange(7)}", rng.randrange(-10, 320), i)
         for i in range(300)],
        "k string, t_us long, probe_id long",
    )
    got = {
        r["probe_id"]: (r["v"], r["valid_from_us"])
        for r in attach_scd2(probes, dim, "k", "t_us", ["v"]).collect()
    }
    runs = {}
    for r in dim.collect():
        runs.setdefault(r["k"], []).append(
            (r["valid_from_us"], r["valid_to_us"], r["v"])
        )
    assert len(got) == 300  # no probe dropped
    for p in probes.collect():
        want = (None, None)
        for frm, to, v in runs.get(p["k"], []):
            if frm <= p["t_us"] and (to is None or p["t_us"] < to):
                want = (v, frm)
        assert got[p["probe_id"]] == want, p


def test_attach_scd2_inclusive_at_valid_from_and_missing_attr_wall(spark):
    from flow_feature_spark.featurestore import attach_scd2, build_scd2

    dim = build_scd2(
        _df(spark, [("k", 10, "A", 0), ("k", 20, "B", 1)]),
        ["k"], "ts_us", ["v"],
    )
    probes = spark.createDataFrame(
        [("k", 9, 0), ("k", 10, 1), ("k", 20, 2)],
        "k string, t_us long, probe_id long",
    )
    got = {r["probe_id"]: r["v"]
           for r in attach_scd2(probes, dim, "k", "t_us", ["v"]).collect()}
    assert got == {0: None, 1: "A", 2: "B"}  # inclusive at the boundary
    with pytest.raises(ValueError, match="lacks attribute"):
        attach_scd2(probes, dim, "k", "t_us", ["nope"])
