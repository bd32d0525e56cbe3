"""Corpus CLI (corpus_job.py): every op end-to-end, parquet in -> out,
including the dedup composition (pairs -> clusters -> anti-join)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flow_feature_spark import corpus_job


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "docs")
    base = [
        (i, f"unique document number {i} with body text {i * 17}", f"s{i % 3}")
        for i in range(40)
    ]
    # 41/42/43: near-identical to 0 (one token differs) -> same simhash cluster
    dupes = [
        (41, "unique document number 0 with body text 0", "s1"),
        (42, "unique document number 0 with body text zero", "s2"),
    ]
    spark.createDataFrame(
        base + dupes, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(path)
    return path


def test_analyze_and_vocab(spark, docs_path, tmp_path):
    out = f"{tmp_path}/an"
    assert corpus_job.run(["--input", docs_path, "--output", out, "--op", "analyze"]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 42 and "quality" in got.columns

    out2 = f"{tmp_path}/vocab"
    assert corpus_job.run(
        ["--input", docs_path, "--output", out2, "--op", "vocab", "--top-n", "5"]
    ) == 0
    vocab = spark.read.parquet(out2).collect()
    assert len(vocab) == 5 and vocab[0]["rank"] == 1


def test_sample_modes(spark, docs_path, tmp_path):
    out = f"{tmp_path}/frac"
    assert corpus_job.run(
        ["--input", docs_path, "--output", out, "--op", "sample", "--fraction", "0.5"]
    ) == 0
    assert 5 < spark.read.parquet(out).count() < 38

    out2 = f"{tmp_path}/strat"
    assert corpus_job.run(
        ["--input", docs_path, "--output", out2, "--op", "sample",
         "--per-stratum", "4", "--stratify-by", "source"]
    ) == 0
    per = spark.read.parquet(out2).groupBy("source").count().collect()
    assert all(r["count"] == 4 for r in per)

    with pytest.raises(SystemExit):
        corpus_job.run(
            ["--input", docs_path, "--output", f"{tmp_path}/x", "--op", "sample"]
        )


def test_pairs_clusters_dedup_composition(spark, docs_path, tmp_path):
    pout, cout, dout = f"{tmp_path}/p", f"{tmp_path}/c", f"{tmp_path}/d"
    assert corpus_job.run(["--input", docs_path, "--output", pout, "--op", "pairs"]) == 0
    pairs = spark.read.parquet(pout)
    pset = {tuple(r) for r in pairs.select("doc_a", "doc_b").collect()}
    assert (0, 41) in pset  # the exact near-dup pair is found

    assert corpus_job.run(["--input", docs_path, "--output", cout, "--op", "clusters"]) == 0
    cl = spark.read.parquet(cout)
    by_doc = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in cl.collect()}
    assert by_doc[41][0] == by_doc[0][0] and by_doc[0][1] and not by_doc[41][1]

    assert corpus_job.run(["--input", docs_path, "--output", dout, "--op", "dedup"]) == 0
    kept = {r["doc_id"] for r in spark.read.parquet(dout).collect()}
    assert 0 in kept and 41 not in kept
    dropped = {d for d, (_, canon) in by_doc.items() if not canon}
    assert kept == set(range(43)) - {40} - dropped  # doc ids 0..39,41,42 minus losers


def test_string_id_col_and_fast_minhash(spark, tmp_path):
    """--id-col with STRING ids (content hashes) through pairs -> clusters ->
    dedup: ids survive the dictionary-encoded clustering, canonical = lexical
    min; --fast-minhash takes the xxhash64 signature path."""
    path = str(tmp_path / "docs")
    rows = [(f"sha{i:03d}", f"unique document number {i} with body text {i * 17}")
            for i in range(30)]
    rows.append(("sha900", "unique document number 0 with body text 0"))
    spark.createDataFrame(rows, "content_id string, text string").write.mode(
        "overwrite"
    ).parquet(path)

    cout, dout = f"{tmp_path}/c", f"{tmp_path}/d"
    assert corpus_job.run([
        "--input", path, "--output", cout, "--op", "clusters",
        "--id-col", "content_id", "--method", "minhash",
        "--minhash-k", "16", "--minhash-bands", "4", "--fast-minhash",
    ]) == 0
    cl = {r["content_id"]: (r["component"], r["is_canonical"])
          for r in spark.read.parquet(cout).collect()}
    assert cl["sha000"] == ("sha000", True)
    assert cl["sha900"] == ("sha000", False)

    assert corpus_job.run([
        "--input", path, "--output", dout, "--op", "dedup",
        "--id-col", "content_id", "--method", "minhash",
        "--minhash-k", "16", "--minhash-bands", "4", "--fast-minhash",
    ]) == 0
    kept = {r["content_id"] for r in spark.read.parquet(dout).collect()}
    assert "sha000" in kept and "sha900" not in kept and len(kept) == 30


def test_tfidf_op(spark, docs_path, tmp_path):
    from flow_feature_spark.ops.text import tfidf_topk

    out = f"{tmp_path}/tfidf"
    assert corpus_job.run([
        "--input", docs_path, "--output", out, "--op", "tfidf",
        "--tfidf-k", "3",
    ]) == 0
    got = spark.read.parquet(out)
    direct = tfidf_topk(spark.read.parquet(docs_path), k=3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # the log-idf variant runs and scores differ where df varies
    out2 = f"{tmp_path}/tfidf_log"
    assert corpus_job.run([
        "--input", docs_path, "--output", out2, "--op", "tfidf",
        "--tfidf-k", "3", "--log-idf",
    ]) == 0
    assert spark.read.parquet(out2).count() > 0


def test_fuzzy_op(spark, docs_path, tmp_path):
    """--op fuzzy: doc 41 shares doc 0's 16-char prefix (identical text
    start), so at least that distance-0 pair must surface; output schema is
    the pair frame."""
    out = f"{tmp_path}/fz"
    assert corpus_job.run([
        "--input", docs_path, "--output", out, "--op", "fuzzy",
    ]) == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id_a", "id_b", "dist"}
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in got.collect()}
    assert pairs[(0, 41)] == 0  # identical prefixes
    assert all(d <= 1 for d in pairs.values())


def test_fuzzy_op_custom_column_and_distance(spark, tmp_path):
    path = str(tmp_path / "short")
    spark.createDataFrame(
        [(1, "alpha"), (2, "alphb"), (3, "alxyz")],
        "doc_id long, name string",
    ).write.mode("overwrite").parquet(path)
    out = f"{tmp_path}/fz2"
    assert corpus_job.run([
        "--input", path, "--output", out, "--op", "fuzzy",
        "--fuzzy-col", "name", "--max-distance", "2",
    ]) == 0
    pairs = {(r["id_a"], r["id_b"]): r["dist"]
             for r in spark.read.parquet(out).collect()}
    assert pairs == {(1, 2): 1}  # alpha~alphb=1; alxyz is 3 away from both
