"""Edit-distance fuzzy join (ops/fuzzy.py): randomized brute-force parity
at d=1 and d=2 (the deletion-neighborhood candidate set must have NO false
negatives and the verify step must kill every false positive), empty-string
and unicode handling, the max_bucket recall trade, NULL wall. Driver gate
pins cross-engine hash-exactness via fuzzy_pairs."""

from __future__ import annotations

import random

import pytest

from flow_feature_spark.ops.fuzzy import deletion_variants, edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(strings, d):
    out = set()
    for i, (ia, sa) in enumerate(strings):
        for ib, sb in strings[i + 1:]:
            dist = _lev(sa, sb)
            if dist <= d:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                out.add((a, b, dist))
    return out


def _df(spark, strings):
    return spark.createDataFrame(strings, "id long, s string")


def _rand_strings(rng, n, alphabet="abc", max_len=7):
    out = []
    for i in range(n):
        base = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, max_len)))
        out.append((i, base))
    return out


@pytest.mark.parametrize("d", [1, 2])
def test_pairs_match_brute_force_randomized(spark, d):
    # tiny alphabet + short strings force dense near-neighborhoods,
    # exercising both shared-variant hits and false-positive kills
    rng = random.Random(40 + d)
    strings = _rand_strings(rng, 120)
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(
            _df(spark, strings), "id", "s", max_distance=d
        ).collect()
    }
    assert got == _brute_pairs(strings, d)


def test_transposition_is_distance_two_not_one(spark):
    # "ab" vs "ba" share a deletion variant but lev = 2: the verify step
    # must drop it at d=1 and keep it at d=2
    strings = [(0, "ab"), (1, "ba")]
    assert edit_distance_pairs(_df(spark, strings), "id", "s", 1).count() == 0
    out = edit_distance_pairs(_df(spark, strings), "id", "s", 2).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in out] == [(0, 1, 2)]


def test_empty_and_single_char_strings(spark):
    strings = [(0, ""), (1, "a"), (2, ""), (3, "ab")]
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(_df(spark, strings), "id", "s", 1).collect()
    }
    assert got == {(0, 1, 1), (0, 2, 0), (1, 2, 1), (1, 3, 1)}


def test_unicode_strings_count_codepoints(spark):
    strings = [(0, "café"), (1, "cafe"), (2, "caf")]
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(_df(spark, strings), "id", "s", 1).collect()
    }
    assert got == _brute_pairs(strings, 1)


def test_variant_counts(spark):
    out = deletion_variants(_df(spark, [(0, "abc")]), "id", "s", 1).collect()
    assert {r["variant"] for r in out} == {"abc", "bc", "ac", "ab"}
    out2 = deletion_variants(_df(spark, [(0, "abc")]), "id", "s", 2).collect()
    assert {r["variant"] for r in out2} == {"abc", "bc", "ac", "ab", "a", "b", "c"}


def test_max_bucket_drops_only_common_variant_pairs(spark):
    # 30 identical strings make "zzz" variants ultra-common; the rare pair
    # ("q", "qa") shares only rare variants and must survive the cap
    strings = [(i, "zzz") for i in range(30)] + [(100, "q"), (101, "qa")]
    capped = edit_distance_pairs(
        _df(spark, strings), "id", "s", 1, max_bucket=5
    ).collect()
    got = {(r["id_a"], r["id_b"], r["dist"]) for r in capped}
    assert (100, 101, 1) in got
    assert not any(a < 30 and b < 30 for a, b, _ in got)  # capped away
    uncapped = edit_distance_pairs(_df(spark, strings), "id", "s", 1)
    assert uncapped.count() == 30 * 29 // 2 + 1


def test_null_string_rejected(spark):
    df = spark.createDataFrame([(0, "a"), (1, None)], "id long, s string")
    with pytest.raises(Exception, match="NULL string"):
        edit_distance_pairs(df, "id", "s", 1).collect()


def test_invalid_distance_rejected(spark):
    with pytest.raises(ValueError):
        edit_distance_pairs(_df(spark, [(0, "a")]), "id", "s", 3)


def test_join_is_pinned_sort_merge_never_broadcast(spark):
    """Both join sides are variant-exploded and never broadcastable at
    design scale; AQE's post-explode size mis-estimate once planned a 137M
    -row broadcast that killed the driver on maxResultSize, and the first
    fix (shuffle_hash) died in the executor instead: the SHJ build-side
    hash map cannot spill ("not enough memory to build hash map" at 137M
    variant rows / 64 partitions). The merge hint must pin spillable
    sort-merge regardless of estimated sizes."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["abc", "abd", "xyz", "xy"])],
        "id long, s string",
    )
    for kwargs in ({}, {"max_bucket": 3}):
        plan = (
            edit_distance_pairs(df, "id", "s", max_distance=2, **kwargs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastExchange" not in plan, kwargs
        assert "SortMergeJoin" in plan, kwargs
        assert "ShuffledHashJoin" not in plan, kwargs
