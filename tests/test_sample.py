"""Deterministic sampling + vocabulary operators (ops/sample.py,
ops/text.token_vocabulary)."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from flow_feature_spark.ops.sample import deterministic_sample, stratified_topk
from flow_feature_spark.ops.text import norm_text, token_vocabulary


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
        F.concat(F.lit("text number "), F.col("id").cast("string")).alias("text"),
    )


def test_sample_fraction_and_determinism(spark):
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in deterministic_sample(df, 0.25).collect())
    # repartitioning must not change membership (the property df.sample lacks)
    b = sorted(
        r["doc_id"]
        for r in deterministic_sample(df.repartition(13, "source"), 0.25).collect()
    )
    assert a == b
    assert 0.18 * 2000 < len(a) < 0.32 * 2000  # binomial(2000, .25) +/- 5 sigma
    assert deterministic_sample(df, 0.0).count() == 0
    assert deterministic_sample(df, 1.0).count() == 2000


def test_sample_salt_draws_independent(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in deterministic_sample(df, 0.5, salt="train").collect()}
    b = {r["doc_id"] for r in deterministic_sample(df, 0.5, salt="valid").collect()}
    assert a != b
    # overlap of two independent 50% draws ~ 25%
    assert 0.15 < len(a & b) / 2000 < 0.35


def test_stratified_topk_bounds_and_determinism(spark):
    df = _docs(spark)
    out = stratified_topk(df, group_col="source", k=5)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {f"s{i}" for i in range(7)} and all(v == 5 for v in per.values())
    again = stratified_topk(df.repartition(17), group_col="source", k=5)
    assert sorted(map(tuple, out.select("doc_id", "sample_rank").collect())) == sorted(
        map(tuple, again.select("doc_id", "sample_rank").collect())
    )
    # stratum smaller than k: keep all rows
    small = stratified_topk(df.filter(F.col("doc_id") < 3), group_col="source", k=5)
    assert small.count() == 3


def test_token_vocabulary_matches_counter(spark):
    df = _docs(spark, n=300)
    got = [(r["token"], r["n"], r["rank"]) for r in token_vocabulary(df, top_n=10).collect()]
    texts = [r["t"] for r in df.select(norm_text(F.col("text")).alias("t")).collect()]
    cnt = Counter(tok for t in texts for tok in t.split(" ") if tok)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(tok, n, i + 1) for i, (tok, n) in enumerate(want)]


def test_bad_params_raise(spark):
    df = _docs(spark, n=10)
    with pytest.raises(ValueError):
        deterministic_sample(df, 1.5)
    with pytest.raises(ValueError):
        stratified_topk(df, k=0)
    with pytest.raises(ValueError):
        token_vocabulary(df, top_n=0)
