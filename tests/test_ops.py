"""Training-data ops: dedup, similarity (ANN recall vs brute force), text
analysis, multimodal plumbing. Cross-engine exactness is enforced separately
by tools/compare_oracle.py; these pin semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flow_feature_spark.ops import dedup as dd
from flow_feature_spark.ops import multimodal as mm
from flow_feature_spark.ops import similarity as sim
from flow_feature_spark.ops import text as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_duplicates_finds_planted_dups(spark, docs):
    # plant duplicates: re-append 10 docs under new ids
    planted = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = docs.unionByName(planted)
    groups = dd.exact_duplicates(both)
    rows = groups.collect()
    assert len(rows) >= 10
    assert all(r["group_size"] >= 2 for r in rows)
    # keeper is always the original (smaller) id
    assert all(r["keeper_doc_id"] < 1_000_000 for r in rows)


def test_ngram_jaccard_self_similarity(spark, docs):
    planted = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = docs.unionByName(planted)
    pairs = dd.ngram_jaccard_pairs(both, threshold=0.99).collect()
    exact_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # each planted copy pairs with its original at jaccard 1.0
    originals_with_shingles = {
        r["doc_a"] for r in pairs if r["doc_b"] == r["doc_a"] + 1_000_000
    }
    assert len(originals_with_shingles) >= 4  # empty/short docs have no shingles
    assert all(r["jaccard"] <= 1.0 for r in pairs)


def test_minhash_lsh_recall_on_planted_dups(spark, docs):
    planted = docs.limit(8).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = docs.unionByName(planted)
    cand = {(r["doc_a"], r["doc_b"]) for r in dd.minhash_lsh_candidates(both).collect()}
    hits = sum(1 for a, b in cand if b == a + 1_000_000)
    assert hits >= 6  # identical docs must collide in every band


def test_simhash_identical_docs_zero_hamming(spark, docs):
    s = dd.simhash_docs(docs.limit(20)).collect()
    by_id = {r["doc_id"]: r["simhash"] for r in s}
    assert all(0 <= v < (1 << 16) for v in by_id.values())


def test_ann_lsh_recall_vs_brute_force(spark, embs):
    exact = sim.cosine_topk(embs, n_queries=8, k=5).collect()
    approx = sim.lsh_bucket_topk(embs, dim=64, n_queries=8, k=5).collect()
    exact_set = {(r["query_id"], r["cand_id"]) for r in exact}
    approx_set = {(r["query_id"], r["cand_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # sign-LSH with 8 planes on random vectors: modest recall, but the
    # top-1-ish neighbors should frequently share the bucket
    assert recall >= 0.2, f"recall={recall}"
    # approx results are a subset of correctly-ranked candidates: every
    # returned (q, c) must have the same cos as brute force
    exact_cos = {(r["query_id"], r["cand_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        k = (r["query_id"], r["cand_id"])
        if k in exact_cos:
            assert abs(exact_cos[k] - r["cos_sim"]) < 1e-12


def test_multimodal_roundtrip(spark, docs):
    media = mm.documents_as_media(docs)
    decoded = mm.decode_media(media).collect()
    assert len(decoded) == docs.count()
    texts = {r["doc_id"]: r["text"] or "" for r in docs.collect()}
    for r in decoded:
        raw = texts[r["doc_id"]].encode("utf-8")
        assert r["byte_len"] == len(raw)
        if raw:
            assert r["header_byte"] == raw[0]
            assert r["n_frames"] == 1 + len(raw) % 16
        else:
            assert r["header_byte"] == -1


def test_text_analysis_basics(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox, and the lazy dog!"), (2, ""), (3, "数据 流 处理")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in tx.analyze_documents(df).collect()}
    assert rows[1]["n_ws_tokens"] == 8
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["n_ws_tokens"] == 0
    assert rows[2]["quality"] == 0.0
    assert rows[3]["lang_pred"] == "zh"
    assert rows[1]["fp_md5"] != rows[2]["fp_md5"]
