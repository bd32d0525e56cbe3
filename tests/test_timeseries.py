"""Regular-grid resampling + decayed counts (timeseries.py): brute-force
parity on randomized inputs, exact dyadic decay arithmetic, dense-grid
contracts. The driver gate pins cross-engine hash-exactness separately via
resample_ffill / decayed_counts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flow_feature_spark.timeseries import decayed_counts, resample_counts

BUCKET_US = 1_000_000  # 1s buckets for tests


def _df(spark, rows):
    # rows: (entity, ts_us, amount, tag, seq)
    return spark.createDataFrame(
        rows, "e string, ts_us long, amount long, tag string, seq long"
    )


def _brute_grid(rows, bucket_us=BUCKET_US):
    """Pure-python reference: dense grid with counts, sums, ffill."""
    from collections import defaultdict

    per = defaultdict(list)
    for e, ts, amount, tag, seq in rows:
        per[e].append((ts, amount, tag, seq))
    out = {}
    for e, evs in per.items():
        bks = [ts // bucket_us for ts, *_ in evs]
        lo, hi = min(bks), max(bks)
        last = None
        for b in range(lo, hi + 1):
            hits = [x for x in evs if x[0] // bucket_us == b]
            if hits:
                last = max(hits, key=lambda x: (x[0], x[3]))[2]
            out[(e, b)] = (
                len(hits),
                sum(x[1] for x in hits),
                last,
            )
    return out


def test_resample_matches_brute_force_randomized(spark):
    rng = random.Random(7)
    rows = []
    for i in range(400):
        e = f"e{rng.randrange(6)}"
        ts = rng.randrange(0, 40 * BUCKET_US)
        rows.append((e, ts, rng.randrange(-5, 50), f"t{rng.randrange(9)}", i))
    got = {
        (r["e"], r["bucket_idx"]): (r["n_events"], r["sum_amount"], r["tag_ffill"])
        for r in resample_counts(
            _df(spark, rows), "e", "ts_us", BUCKET_US,
            sum_col="amount", ffill_col="tag", tiebreak_col="seq",
        ).collect()
    }
    assert got == _brute_grid(rows)


def test_resample_grid_is_dense_and_zero_filled(spark):
    rows = [("a", 0, 1, "x", 0), ("a", 5 * BUCKET_US + 3, 2, "y", 1)]
    out = resample_counts(
        _df(spark, rows), "e", "ts_us", BUCKET_US,
        sum_col="amount", ffill_col="tag",
    ).orderBy("bucket_idx").collect()
    assert [r["bucket_idx"] for r in out] == [0, 1, 2, 3, 4, 5]
    assert [r["n_events"] for r in out] == [1, 0, 0, 0, 0, 1]
    assert [r["sum_amount"] for r in out] == [1, 0, 0, 0, 0, 2]
    assert [r["tag_ffill"] for r in out] == ["x", "x", "x", "x", "x", "y"]
    assert [r["bucket_start_us"] for r in out] == [i * BUCKET_US for i in range(6)]


def test_resample_bucket_last_breaks_ts_ties_by_tiebreak(spark):
    rows = [("a", 10, 1, "first", 0), ("a", 10, 1, "second", 1)]
    out = resample_counts(
        _df(spark, rows), "e", "ts_us", BUCKET_US,
        ffill_col="tag", tiebreak_col="seq",
    ).collect()
    assert out[0]["tag_ffill"] == "second"


def test_resample_rejects_reserved_column_clash(spark):
    df = spark.createDataFrame([("a", 1, 2)], "e string, ts_us long, bucket_idx long")
    with pytest.raises(ValueError, match="clashes"):
        resample_counts(df, "e", "ts_us", BUCKET_US)


def test_decayed_matches_brute_force_and_is_dyadic_exact(spark):
    rng = random.Random(11)
    rows = []
    for i in range(300):
        e = f"e{rng.randrange(4)}"
        ts = rng.randrange(0, 30 * BUCKET_US)
        rows.append((e, ts, 0, "t", i))
    grid = resample_counts(_df(spark, rows), "e", "ts_us", BUCKET_US)
    K = 20
    out = decayed_counts(grid, "e", "bucket_idx", "n_events", lookback=K).collect()
    # brute force over the dense per-entity count series
    series = {}
    for r in grid.collect():
        series[(r["e"], r["bucket_idx"])] = r["n_events"]
    for r in out:
        num = sum(
            series.get((r["e"], r["bucket_idx"] - j), 0) << (K - j)
            for j in range(K + 1)
            if (r["e"], r["bucket_idx"] - j) in series
        )
        assert r["decayed_num"] == num
        # dyadic quotient is exactly representable -> strict equality
        assert r["decayed"] == num / float(1 << K)


def test_decayed_requires_valid_lookback_and_walls_overflow(spark):
    grid = spark.createDataFrame(
        [("a", 0, 1 << 50)], "e string, bucket_idx long, n_events long"
    )
    with pytest.raises(ValueError):
        decayed_counts(grid, "e", "bucket_idx", "n_events", lookback=0)
    with pytest.raises(Exception, match="overflows"):
        decayed_counts(grid, "e", "bucket_idx", "n_events", lookback=20).collect()


def test_decayed_halves_per_empty_bucket(spark):
    # one event at bucket 0, then silence: decayed at bucket b = 2^-b
    rows = [("a", 0, 0, "t", 0), ("a", 6 * BUCKET_US, 0, "t", 1)]
    grid = resample_counts(_df(spark, rows), "e", "ts_us", BUCKET_US)
    out = {
        r["bucket_idx"]: r["decayed"]
        for r in decayed_counts(grid, "e", "bucket_idx", "n_events").collect()
    }
    for b in range(6):
        assert out[b] == 2.0 ** -b  # dyadic -> exact doubles
    assert out[6] == 1.0 + 2.0 ** -6


def test_resample_gap_budget_wall_raises_loudly(spark):
    # one entity silent for 100 buckets: budget 50 must raise, 1000 must pass
    rows = [("e", 0, 1, "a", 0), ("e", 100 * BUCKET_US, 1, "b", 1)]
    df = _df(spark, rows)
    ok = resample_counts(df, "e", "ts_us", BUCKET_US, max_gap_buckets=1000)
    assert ok.count() == 101
    import pytest as _pt
    from py4j.protocol import Py4JJavaError

    walled = resample_counts(df, "e", "ts_us", BUCKET_US, max_gap_buckets=50)
    with _pt.raises(Exception) as ei:
        walled.count()
    assert "max_gap_buckets" in str(ei.value)
    with _pt.raises(ValueError):
        resample_counts(df, "e", "ts_us", BUCKET_US, max_gap_buckets=0)


def test_resample_entity_col_named_entity_works(spark):
    # regression: entity_col == 'entity' used to emit a duplicate column and
    # fail the groupBy with an ambiguous reference
    df = spark.createDataFrame(
        [("a", 0, 5), ("a", 2_500_000, 7), ("b", 0, 1)],
        "entity string, ts_us long, amount long",
    )
    out = resample_counts(df, "entity", "ts_us", BUCKET_US, sum_col="amount")
    got = {(r["entity"], r["bucket_idx"]): (r["n_events"], r["sum_amount"])
           for r in out.collect()}
    assert got == {
        ("a", 0): (1, 5), ("a", 1): (0, 0), ("a", 2): (1, 7), ("b", 0): (1, 1),
    }
