"""Future-window labels (featurestore.attach_future_labels) and rational
tf-idf (ops/text.tfidf_topk), both brute-force-pinned."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from flow_feature_spark.featurestore import attach_future_labels
from flow_feature_spark.ops.text import tfidf_topk


def test_future_labels_match_brute_force_with_duplicate_ts(spark):
    rng = random.Random(3)
    rows = []
    for ent in ["a", "b"]:
        ts = 0
        for i in range(40):
            ts += rng.randrange(0, 4)  # duplicates ARE generated (step 0)
            rows.append((ent, i, ts, rng.randrange(0, 10)))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_us long, win long")
    out = attach_future_labels(df, horizon_seconds=5e-6, value_col="win")
    got = {(r["conv_id"], r["turn_idx"]): (r["label_n"], r["label_sum"])
           for r in out.collect()}
    for ent, idx, ts, _ in rows:
        future = [w for e2, _, t2, w in rows
                  if e2 == ent and ts < t2 <= ts + 5]
        assert got[(ent, idx)] == (len(future), sum(future)), (ent, idx)


def test_future_labels_empty_window_is_zero_and_horizon_validated(spark):
    df = spark.createDataFrame(
        [("a", 1, 0, 7)], "conv_id string, turn_idx int, ts_us long, win long"
    )
    r = attach_future_labels(df, 10.0, value_col="win").collect()[0]
    assert (r["label_n"], r["label_sum"]) == (0, 0)
    with pytest.raises(ValueError, match="positive"):
        attach_future_labels(df, 0.0)


def test_tfidf_matches_brute_force(spark):
    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple cherry cherry date"),
        (4, ""),          # empty doc: contributes to N, emits no terms
        (5, None),        # NULL text likewise
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_topk(df, k=2)
    got = {(r["doc_id"], r["rank"]): (r["token"], r["tf"], r["df"], r["score"])
           for r in out.collect()}
    assert set(r[0] for r in got) <= {1, 2, 3}

    # brute force
    toks = {d: t.split() for d, t in docs if t}
    n_docs = len(docs)
    dfreq: dict[str, int] = {}
    for ts in toks.values():
        for tok in set(ts):
            dfreq[tok] = dfreq.get(tok, 0) + 1
    for d, ts in toks.items():
        scores = []
        for tok in set(ts):
            tf = ts.count(tok)
            score = math.floor(tf * n_docs / dfreq[tok] * 1e6 + 0.5) / 1e6
            scores.append((-score, tok, tf))
        scores.sort()
        for rank, (neg, tok, tf) in enumerate(scores[:2], start=1):
            assert got[(d, rank)] == (tok, tf, dfreq[tok], -neg), (d, rank)


def test_tfidf_log_idf_engine_variant_and_k_validation(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = tfidf_topk(df, k=1, log_idf=True).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # 'a' appears only in doc 1: score = 2*ln(2/1); 'b' in both: ln(1)=0
    assert by_doc[1]["token"] == "a"
    assert by_doc[1]["score"] == pytest.approx(
        math.floor(2 * math.log(2) * 1e6 + 0.5) / 1e6
    )
    with pytest.raises(ValueError, match="k must be"):
        tfidf_topk(df, k=0)


def test_tfidf_tie_breaks_on_token(spark):
    df = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "unrelated")], "doc_id long, text string"
    )
    out = tfidf_topk(df, k=2).filter(F.col("doc_id") == 1).collect()
    assert [r["token"] for r in sorted(out, key=lambda r: r["rank"])] == [
        "alpha", "zeta",
    ]
