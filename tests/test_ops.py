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


def test_simhash_banded_signature_range(spark, docs):
    s = dd.simhash_docs(docs.limit(20)).collect()
    for r in s:
        for k in range(4):
            assert 0 <= r[f"h{k}"] < (1 << 16)


def test_simhash_identical_docs_pair_at_zero_hamming(spark, docs):
    planted = docs.limit(6).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = docs.unionByName(planted)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dd.simhash_pairs(both, max_hamming=0).collect()}
    hits = sum(1 for (a, b), h in pairs.items() if b == a + 1_000_000 and h == 0)
    assert hits >= 6


def test_simhash64_candidate_volume_below_16bit(spark):
    """Scale guard: the 4x16-bit band join must generate far fewer candidate
    pairs than the legacy 16-bit half-signature join (round 1 measured 4.2M
    pairs at sf0.1 from the 256-bucket halves). Uses a DIVERSE corpus — the
    testdata documents table is near-dup-heavy by design, where large
    candidate sets are real dups, not hash weakness."""
    import random

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(5000)]
    rows = [
        (i, " ".join(rng.sample(vocab, 30))) for i in range(2000)
    ]
    diverse = spark.createDataFrame(rows, "doc_id long, text string")
    s = dd.simhash_docs(diverse).persist()
    n_docs = s.count()

    def band_pairs(col):
        a, b = s.alias("a"), s.alias("b")
        return (
            a.join(b, (F.col(f"a.{col}") == F.col(f"b.{col}"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select("a.doc_id", "b.doc_id").count()
        )

    # 64-bit path: candidates from the four 16-bit bands (65536 buckets each)
    cand64 = sum(band_pairs(f"h{k}") for k in range(4))
    # legacy 16-bit shape: same signature truncated to 2 x 8-bit halves
    legacy = s.select(
        "doc_id",
        (F.col("h0").bitwiseAND(F.lit(0xFF))).alias("l0"),
        F.shiftright(F.col("h0"), 8).alias("l1"),
    ).persist()
    a, b = legacy.alias("a"), legacy.alias("b")
    cand16 = sum(
        a.join(b, (F.col(f"a.{c}") == F.col(f"b.{c}"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))).count()
        for c in ("l0", "l1")
    )
    assert cand64 < cand16 / 4, f"cand64={cand64} cand16={cand16} n={n_docs}"


def test_ngram_jaccard_viral_shingle_cap(spark):
    """A boilerplate shingle shared by every doc must not blow up the join:
    with the DF cap it contributes zero candidate pairs."""
    viral = "terms of service apply"
    rows = [(i, f"{viral} document body {i} unique tail {i * 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dd.ngram_jaccard_pairs(df, threshold=0.01, max_doc_freq=10)
    uncapped = dd.ngram_jaccard_pairs(df, threshold=0.01, max_doc_freq=10_000)
    # without the cap every pair shares the viral shingles -> ~40*39/2 pairs;
    # with it, docs only pair through genuinely shared non-viral shingles
    assert uncapped.count() == 40 * 39 // 2
    assert capped.count() == 0


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


def test_ivf_topk_scores_and_planted_duplicate(spark, embs):
    """IVF coarse-quantizer ANN: every returned score must equal the brute
    force cosine, and a planted exact duplicate of a query lands at rank 1
    (same vector -> same cell -> guaranteed candidate)."""
    dup = (
        embs.filter(F.col("vec_id") == 0)
        .withColumn("vec_id", F.lit(10_000).cast(embs.schema["vec_id"].dataType.simpleString()))
    )
    both = embs.unionByName(dup)
    approx = sim.ivf_topk(both, dim=64, n_queries=8, k=5).collect()
    assert approx
    exact = sim.cosine_topk(both, n_queries=8, k=5).collect()
    exact_cos = {(r["query_id"], r["cand_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["cand_id"])
        if key in exact_cos:
            assert abs(exact_cos[key] - r["cos_sim"]) < 1e-12
    q0 = [r for r in approx if r["query_id"] == 0]
    assert q0 and q0[0]["cand_id"] == 10_000 and q0[0]["cos_sim"] == 1.0 \
        and q0[0]["rank"] == 1


def test_resize_and_frame_sample_plumbing(spark, docs):
    """Binary-in/binary-out resize and row-exploding frame sampling: shape
    and byte-level determinism of the stubs, against a pure-Python replay."""
    media = mm.documents_as_media(docs.limit(50))
    resized = mm.resize_media(media, width=8, height=4).collect()
    assert len(resized) == 50
    assert all(len(r["resized"]) == 32 for r in resized)
    assert all(r["out_width"] == 8 and r["out_height"] == 4 for r in resized)

    frames = mm.sample_frames(media, every_n=2).collect()
    texts = {r["doc_id"]: (r["text"] or "").encode("utf-8")
             for r in docs.limit(50).collect()}
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, payload in texts.items():
        if not payload:
            assert doc_id not in by_doc
            continue
        n = len(payload)
        nf = 1 + n % 16
        fs = -(-n // nf)
        expect = [(i, payload[i * fs:(i + 1) * fs]) for i in range(0, nf, 2)]
        got = sorted(((r["frame_idx"], bytes(r["frame"])) for r in by_doc[doc_id]))
        assert got == expect, doc_id
        for r in by_doc[doc_id]:
            fr = bytes(r["frame"])
            assert r["frame_len"] == len(fr)
            assert r["frame_head"] == (fr[0] if fr else -1)


def test_rolling_fingerprint_is_order_sensitive(spark):
    """fp_roll distinguishes token order (fp_md5 of different text differs
    anyway; the rolling hash's point is order sensitivity at equal token
    SETS) and replays the fold in pure Python."""
    import hashlib

    from flow_feature_spark.ops.text import ROLL_BASE, ROLL_MOD

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fp_roll"] for r in tx.analyze_documents(df).collect()}
    assert rows[1] == rows[3]
    assert rows[1] != rows[2]

    def h(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % ROLL_MOD

    toks = [h(w) for w in "alpha beta gamma".split()]
    acc = toks[0]
    for x in toks[1:]:
        acc = (acc * ROLL_BASE + x) % ROLL_MOD
    assert rows[1] == acc


# --- injectable codec: swapping the stub for a "real" decoder needs no
# plumbing change (VERDICT r2 item 5) -----------------------------------------

def test_codec_injection_needs_no_plumbing_change(spark, docs):
    # fakes defined IN the test body: cloudpickle ships nested functions by
    # value (module-level test functions pickle by reference, and executors
    # cannot import the tests package)
    def _fake_real_decoder(payload):
        """Stands in for a PIL-backed decoder: different output values than
        the stub, same contract (byte_len, header_byte, w, h, n_frames)."""
        if payload is None or len(payload) == 0:
            return 0, -1, 0, 0, 0
        return len(payload), payload[-1], 1024, 768, 42

    def _fake_real_resizer(payload, width, height):
        return bytes([width % 256, height % 256]) * ((width * height) // 2)

    def _fake_real_framer(payload):
        return [payload[:3], payload[3:6], payload[6:9]]

    media = mm.documents_as_media(docs.limit(20))

    dec = mm.decode_media(media, decoder=_fake_real_decoder).collect()
    assert len(dec) == 20
    assert all(r["fake_width"] == 1024 and r["n_frames"] == 42 for r in dec)
    # header_byte comes from the injected decoder (last byte), not the stub's
    raw = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert all(r["header_byte"] == raw[r["doc_id"]][-1] for r in dec if raw[r["doc_id"]])

    rez = mm.resize_media(media, width=8, height=4, resizer=_fake_real_resizer).collect()
    assert all(bytes(r["resized"]) == bytes([8, 4]) * 16 for r in rez)

    fr = mm.sample_frames(media, every_n=2, framer=_fake_real_framer).collect()
    # 3 frames per doc, every 2nd -> frame_idx {0, 2}
    assert {r["frame_idx"] for r in fr} == {0, 2}
    assert all(r["frame_len"] <= 3 for r in fr)


def test_default_codec_unchanged_by_injection_support(spark, docs):
    """The no-arg paths must still run the deterministic stubs (oracle
    contract for multimodal_decode / frame_sample driver queries)."""
    media = mm.documents_as_media(docs.limit(10))
    dec = mm.decode_media(media).collect()
    for r in dec:
        assert r["n_frames"] == 1 + r["byte_len"] % 16


def test_minhash_fast_signatures_shape_and_recall(spark, docs):
    """The xxhash64 scale path: same (doc_id, mh0..mh{k-1}) shape as the md5
    family, identical-doc signatures identical, and banded candidates through
    ``signatures=`` recover planted duplicates exactly like the default path."""
    planted = docs.limit(8).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = docs.unionByName(planted)
    sig = dd.minhash_signatures_fast(both, k=16)
    assert sig.columns == ["doc_id"] + [f"mh{i}" for i in range(16)]
    rows = {r["doc_id"]: tuple(r)[1:] for r in sig.collect()}
    # identical text -> identical signature
    same = [d for d in rows if d >= 1_000_000 and (d - 1_000_000) in rows]
    assert same and all(rows[d] == rows[d - 1_000_000] for d in same)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dd.minhash_lsh_candidates(
            both, k=16, bands=4, signatures=dd.minhash_signatures_fast(both, k=16)
        ).collect()
    }
    hits = sum(1 for a, b in cand if b == a + 1_000_000)
    assert hits >= 6


def test_minhash_fast_mutation_lowers_collisions(spark):
    """Signature distance tracks Jaccard: a heavily-mutated variant must share
    fewer minhash positions with its base than a lightly-mutated one."""
    base_words = [f"w{i}" for i in range(120)]
    light = list(base_words); light[5] = "x5"            # ~97% shingles kept
    heavy = [w if i % 3 else f"y{i}" for i, w in enumerate(base_words)]
    df = spark.createDataFrame(
        [(0, " ".join(base_words)), (1, " ".join(light)), (2, " ".join(heavy))],
        "doc_id long, text string",
    )
    r = {row["doc_id"]: tuple(row)[1:]
         for row in dd.minhash_signatures_fast(df, k=64).collect()}
    match_light = sum(a == b for a, b in zip(r[0], r[1]))
    match_heavy = sum(a == b for a, b in zip(r[0], r[2]))
    assert match_light > match_heavy
    assert match_light >= 40  # J ~ 0.95 -> most positions agree


def test_lsh_keyed_by_table_matches_exploded_column_form(spark, embs):
    """The production union-of-branches key frame (lsh_keyed_by_table, SQL-
    text expressions) must be row-identical to exploding the Column-built
    lsh_bucket_keys — same planes, same dot order, same signs. Guards the
    codegen-shape rewrite (each union branch stays under Janino's 64 KB
    method limit where the single exploded array expression does not)."""
    from pyspark.sql import functions as F

    union_form = sim.lsh_keyed_by_table(embs, 64, n_tables=4, planes_per_table=8)
    explode_form = (
        embs.select(
            F.col("vec_id").alias("vid"),
            F.explode(
                sim.lsh_bucket_keys(F.col("embedding"), 64, 4, 8)
            ).alias("b"),
        ).select("vid", F.col("b.table_id").alias("table_id"), F.col("b.key").alias("key"))
    )
    a = union_form.select("vid", "table_id", "key")
    assert a.exceptAll(explode_form).count() == 0
    assert explode_form.exceptAll(a).count() == 0
    assert a.count() == embs.count() * 4


def test_lsh_multiprobe_recall_not_worse(spark, embs):
    """Multiprobe (flipping the lowest-|margin| sign bits) may only ADD
    probe buckets per table, so the candidate set is a superset and recall
    against exact top-k must not drop; flips=0 stays the oracled default."""
    exact = {(r["query_id"], r["cand_id"])
             for r in sim.cosine_topk(embs, n_queries=8, k=5).collect()}

    def rec(flips):
        got = {(r["query_id"], r["cand_id"])
               for r in sim.lsh_bucket_topk(
                   embs, dim=64, n_queries=8, k=5,
                   multiprobe_flips=flips).collect()}
        return len(exact & got) / len(exact)

    assert rec(3) >= rec(0)


def test_turn_overlap_repetition_features(spark):
    """Adjacent-turn token overlap: exact set sizes, r6 Jaccard, NULL first
    turns, exact-repeat flag, case/whitespace normalization."""
    from pyspark.sql import functions as F

    from flow_feature_spark.ops.text import turn_overlap

    rows = [
        ("c1", 1, 0, "Hello world"),
        ("c1", 2, 1, "hello   WORLD"),      # normalized exact token match
        ("c1", 3, 2, "hello there"),         # 1 shared of 3 union
        ("c1", 4, 3, "hello there"),          # exact repeat
        ("c1", 5, 4, ""),                     # empty text: 0 tokens
        ("c1", 6, 5, ""),                     # empty vs empty: union 0 -> NULL jac
        ("c2", 1, 0, "solo"),                 # first turn of its conv
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts_us long, turn_idx int, text string")
    out = {(r["conv_id"], r["ts_us"]): r for r in turn_overlap(df).collect()}

    first = out[("c1", 1)]
    assert first["n_shared"] is None and first["jaccard_prev"] is None \
        and first["is_exact_repeat"] is None
    norm = out[("c1", 2)]
    assert (norm["n_shared"], norm["n_union"], norm["jaccard_prev"]) == (2, 2, 1.0)
    assert norm["is_exact_repeat"] is False  # raw texts differ
    partial = out[("c1", 3)]
    assert (partial["n_shared"], partial["n_union"]) == (1, 3)
    assert partial["jaccard_prev"] == pytest.approx(0.333333)
    rep = out[("c1", 4)]
    assert rep["is_exact_repeat"] is True and rep["jaccard_prev"] == 1.0
    empty = out[("c1", 5)]
    assert (empty["n_tokens"], empty["n_shared"], empty["n_union"]) == (0, 0, 2)
    ee = out[("c1", 6)]
    assert ee["n_union"] == 0 and ee["jaccard_prev"] is None \
        and ee["is_exact_repeat"] is True
    assert out[("c2", 1)]["n_shared"] is None


def test_token_vocabulary_topn_is_take_ordered_not_global_window(spark):
    """The top-N cut must compile to TakeOrderedAndProject (parallel partial
    top-N) — a global rank window would hold the whole vocabulary (billions
    of distinct tokens on a web corpus) in one task. The rank window that
    remains operates on the already-cut top_n rows only."""
    from flow_feature_spark.ops.text import token_vocabulary

    docs = spark.createDataFrame(
        [(1, "a b b c c c"), (2, "c d d a")], "doc_id long, text string"
    )
    out = token_vocabulary(docs, top_n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = [(r["token"], r["n"], r["rank"]) for r in out.collect()]
    assert got == [("c", 4, 1), ("a", 2, 2)]


def test_near_dup_multiprobe_superset_and_exact_values(spark, embs):
    """The multiprobe pair path must (a) return a SUPERSET of the flips=0
    pair set, (b) never invent a pair below the cosine threshold, and (c)
    agree value-for-value with brute force on the pairs it does return."""
    kw = dict(dim=64, threshold=0.35, n_tables=4, planes_per_table=8)
    base = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in sim.embedding_near_dup_pairs(embs, **kw).collect()}
    multi = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
             for r in sim.embedding_near_dup_pairs(
                 embs, multiprobe_flips=2, **kw).collect()}
    assert set(base) <= set(multi)
    for p, c in base.items():
        assert multi[p] == c
    # brute-force ground truth: every returned pair must be real
    a, b = embs.alias("a"), embs.alias("b")
    brute = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
        .collect()
    }
    assert set(multi) <= set(brute)
    for p, c in multi.items():
        assert brute[p] == c
    # the whole point: strictly more true pairs found (recall lift); if the
    # base probe already found everything this corpus can't evidence a lift
    base_recall = len(base) / len(brute)
    multi_recall = len(multi) / len(brute)
    assert multi_recall >= base_recall
    assert multi_recall > base_recall or base_recall == 1.0, (
        f"base={base_recall:.3f} multi={multi_recall:.3f} n_true={len(brute)}"
    )


def test_near_dup_bucket_cap_drops_oversized_buckets(spark):
    """r7: the max_bucket_size cap moved from a broadcast anti-join to a
    len(home)-check inside the cogrouped bucket scorer — semantics must be
    unchanged: a bucket larger than the cap contributes NO candidate pairs
    (its members still pair through other tables' buckets), on both the
    flips=0 and the multiprobe path."""
    import math

    # 6 identical vectors: every table puts all of them in ONE bucket, so a
    # cap below 6 suppresses every pair; a cap of >= 6 yields all 15 pairs.
    vec = [1.0] * 64
    rows = [(i, vec) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=64, threshold=0.9, n_tables=4, planes_per_table=8)
    for flips in (0, 2):
        capped = sim.embedding_near_dup_pairs(
            df, max_bucket_size=5, multiprobe_flips=flips, **kw
        ).collect()
        assert capped == [], f"flips={flips}: capped bucket must emit nothing"
        full = sim.embedding_near_dup_pairs(
            df, max_bucket_size=6, multiprobe_flips=flips, **kw
        ).collect()
        assert len(full) == 15, f"flips={flips}"
        assert all(math.isclose(r["cos_sim"], 1.0) for r in full)


def test_near_dup_supergroup_coarsening_is_invariant(spark, embs):
    """r7: the cogroup groups on (table_id, key >> shift) with exact buckets
    re-segmented inside the scorer — output must be IDENTICAL at every
    supergroup_bits value, on both the multiprobe and the flips=0 path.
    r=14 makes the default (bits=11) actually coarsen (shift=3), which the
    r=8 oracle gates never exercise. Planted exact duplicates guarantee
    every table has colliding buckets at any r."""
    dup = embs.limit(300).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    corpus = embs.unionByName(dup)
    kw = dict(dim=64, threshold=0.35, n_tables=2, planes_per_table=14)
    for flips in (0, 2):
        fine = {(r_["vec_a"], r_["vec_b"]): r_["cos_sim"]
                for r_ in sim.embedding_near_dup_pairs(
                    corpus, multiprobe_flips=flips, supergroup_bits=14, **kw
                ).collect()}
        coarse = {(r_["vec_a"], r_["vec_b"]): r_["cos_sim"]
                  for r_ in sim.embedding_near_dup_pairs(
                      corpus, multiprobe_flips=flips, **kw  # default bits=11
                  ).collect()}
        assert fine == coarse, f"flips={flips}: coarsening changed the output"
        assert len(fine) >= 300, "planted duplicate pairs must be found"
