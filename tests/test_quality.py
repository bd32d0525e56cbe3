"""Data-quality expectations (quality.check_expectations): every constraint
kind's violation count, NULL exemption discipline, one-scan plan shape.

Reference basis: none in the reference (it assumes clean pcaps); mandated by
the build brief's training-pipeline scope — the ingest gate ahead of feature
extraction, sibling to the profiler (SURVEY §2.10)."""

from __future__ import annotations

from flow_feature_spark.quality import (
    check_expectations,
    expect_expr,
    expect_in_range,
    expect_in_set,
    expect_like,
    expect_not_null,
    expect_row_count,
    expect_unique,
)


def _report(df, exps):
    rows = check_expectations(df, exps).collect()
    return {(r["check_name"], r["column_name"]): r for r in rows}


def test_all_constraint_kinds(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "u1", "tok_x"),
            ("b", 5, "u2", "tok_y"),
            ("c", 99, "u2", "raw_z"),   # out of range; dup key; bad prefix
            (None, 3, "u3", None),      # null k; null s exempt from like
            ("e", None, "u2", "tok_w"), # null v exempt from range; triple key
        ],
        "k string, v int, uid string, s string",
    )
    exps = [
        expect_not_null("k"),
        expect_in_range("v", 0, 10),
        expect_in_set("k", ["a", "b", "c", "e"]),
        expect_like("s", "tok\\_%"),
        expect_unique("uid"),
        expect_row_count(7),
        expect_expr("v_odd", "v % 2 = 1"),
    ]
    r = _report(df, exps)
    assert len(r) == 7
    get = lambda k, c: (r[(k, c)]["violations"], r[(k, c)]["passed"])  # noqa: E731

    assert get("not_null", "k") == (1, False)
    assert get("in_range", "v") == (1, False)        # 99 only; NULL exempt
    assert get("in_set", "k") == (0, True)           # NULL exempt
    assert get("like", "s") == (1, False)            # raw_z; NULL exempt
    assert get("unique", "uid") == (2, False)        # u2 x3 -> 2 excess rows
    assert get("row_count", "*") == (2, False)       # 5 rows, want 7
    assert get("expr", "v_odd") == (0, True)         # 1,5,99,3 odd; NULL exempt
    assert all(row["total"] == 5 for row in r.values())


def test_unique_multi_col_and_null_keys(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), (None, 1), (None, 1)],
        "g string, i int",
    )
    r = _report(df, [expect_unique("g", "i")])
    # NULL-containing tuples are exempt: complete tuples are (a,1)x2,(a,2)
    assert r[("unique", "g, i")]["violations"] == 1


def test_passing_gate_and_empty_exps(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    rep = check_expectations(
        df, [expect_not_null("k"), expect_row_count(1)]
    ).collect()
    assert all(r["passed"] for r in rep)
    try:
        check_expectations(df, [])
        raise AssertionError("empty expectations must fail")
    except ValueError:
        pass


def test_quality_single_scan(spark):
    """All constraints cost ONE scan (conditional sums in one aggregate;
    uniqueness adds an Expand, not a rescan)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rep = check_expectations(
        ev,
        [
            expect_not_null("user_id"),
            expect_in_range("value", 0, 490),
            expect_unique("event_id"),
            expect_expr("ts_set", "ts IS NOT NULL"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2  # one scan node
    assert {r["check_name"] for r in rep.collect()} == {
        "not_null", "in_range", "unique", "expr"
    }
