"""Deduplication operators (exact + near-dup families).

All variants are shuffle-architected for web scale:

* exact       — one hash-groupBy on the content fingerprint.
* n-gram Jaccard — explode word shingles, self-join on shingle (the join key
  is the shingle hash, so co-occurrence is a co-partitioned equi-join),
  count intersections, filter by threshold. No pairwise cross join ever.
* MinHash+LSH — k md5-derived min-hashes per doc, banded into b band keys;
  candidate pairs come from an equi-join on (band_id, band_hash) — the
  classic sub-quadratic path; verified with exact Jaccard on candidates.
* SimHash     — per-token hashes bit-summed into a 64-bit signature held as
  four 16-bit bands; near-dup = small hamming distance. Candidates come from
  the 4x16-bit band equi-join (pigeonhole: hamming<=3 over 4 bands implies at
  least one exactly-equal band), so candidate volume is O(sum of band-bucket
  sizes squared) with 65536 buckets per band — not the O(n^2/256) of a 16-bit
  signature.
* embedding cosine — see ops.similarity (shares the dot-product kernel).

Hash discipline: md5 hex -> int64 via base-16 parse, reproducible in any
engine (the DuckDB oracles use the identical construction), unlike
engine-native hash() functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flow_feature_spark.ops.text import norm_text

# MinHash production defaults: k=128 hashes in b=16 bands of r=8 rows gives
# an LSH threshold s* = (1/b)^(1/r) = 0.707 with a steep S-curve — the noisy
# k=8/r=2 curve (s* ~ 0.5, huge variance) of rounds 1-2 is kept ONLY for the
# sf0.01 driver oracle via explicit arguments (__spark_entry__ passes k=8,
# bands=4 so the DuckDB oracle stays cheap). Measured precision/recall for
# both parameter sets: BENCH/MINHASH_QUALITY.md.
N_MINHASH = 128
N_BANDS = 16  # rows per band = N_MINHASH // N_BANDS = 8
SHINGLE_K = 3
SIMHASH_BANDS = 4  # 4 x 16-bit bands = 64-bit signature
# Shingles shared by more than this many documents are dropped from candidate
# generation (not from per-doc sizes): one viral boilerplate shingle shared by
# k docs would otherwise emit k^2/2 join rows. High enough that nothing is
# dropped at test scale; at web scale set it near the band-bucket cap.
MAX_SHINGLE_DOC_FREQ = 10_000


def md5_int(c: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative int64 (60 bits)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-shingles of the normalized text (array<string>)."""
    words = F.split(norm_text(text), " ")
    n = F.size(words)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(sh)


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs: fingerprint, size, keeper."""
    return (
        df.select("doc_id", F.md5(norm_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("group_size") >= 2)
    )


def _doc_shingles(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select("doc_id", F.explode(shingles(F.col(text_col))).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_doc_freq: int = MAX_SHINGLE_DOC_FREQ,
) -> DataFrame:
    """Doc pairs with word-3-gram Jaccard >= threshold.

    explode -> equi-join on shingle -> per-pair intersection counts -> exact
    Jaccard. The shingle join is the scale path: pairs are generated only for
    docs that actually share a shingle — AND only through shingles whose
    document frequency is <= ``max_doc_freq``. Without the cap, one viral
    shingle shared by k docs emits k^2/2 join rows; with it, join output is
    bounded by max_doc_freq^2/2 per shingle. Per-doc shingle-set sizes (the
    Jaccard denominators) still count every shingle, so the score is a lower
    bound for pairs whose overlap includes dropped boilerplate.
    """
    # DISK_ONLY, not MEMORY_AND_DISK: the exploded table is corpus x shingles
    # rows — at web scale caching it in executor memory evicts everything
    # else first and THEN spills anyway; spilling to local disk up front
    # bounds the executor-memory envelope at ~one Arrow batch per task while
    # still computing the explode once for its three consumers (sizes, the
    # hot-shingle scan, and both sides of the pair join).
    from pyspark import StorageLevel

    sh = _doc_shingles(df, text_col).persist(StorageLevel.DISK_ONLY)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # hot-shingle set: tiny by construction (few shingles exceed the cap),
    # partial-aggregated count then broadcast anti-join — no extra big shuffle
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("shingle")
    )
    sh_join = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = sh_join.alias("a"), sh_join.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.floor(
                (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))) * 1e6
                + 0.5
            )
            / 1e6,
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")


def minhash_signatures(
    df: DataFrame, text_col: str = "text", k: int = N_MINHASH
) -> DataFrame:
    """k min-hashes per doc: min over shingles of md5_int(shingle || '#' || i)."""
    sh = _doc_shingles(df, text_col)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    hashed = sh.select(
        "doc_id", seeds, "shingle"
    ).withColumn(
        "h", md5_int(F.concat(F.col("shingle"), F.lit("#"), F.col("seed").cast("string")))
    )
    return (
        hashed.groupBy("doc_id")
        .pivot("seed", list(range(k)))
        .min("h")
        .select("doc_id", *[F.col(str(i)).alias(f"mh{i}") for i in range(k)])
    )


def minhash_signatures_fast(
    df: DataFrame, text_col: str = "text", k: int = N_MINHASH
) -> DataFrame:
    """Scale-path signatures (same output shape as ``minhash_signatures``):
    ONE xxhash64 per shingle, then the k-member family derived as
    ``h_i = xxhash64(shingle_hash, i)`` inside array transforms — no
    shingle x seed ROW EXPLOSION (the md5 path materializes |shingles| * k
    rows and shuffles them through a pivot; this computes each doc's whole
    signature in a single projection, shuffle-free). At 10^6 docs x 40
    shingles x k=128 that is the difference between 5 * 10^9 cheap int64
    hashes in-row and 5 * 10^9 exploded rows + md5(string) each.

    NOT cross-engine: xxhash64 is Spark-native, so the DuckDB oracle keeps
    pinning the md5 family (``minhash_signatures``) at small k; this is the
    production path the corpus-scale bench exercises. Quality is measured,
    not assumed: on the mid-band corpus at k=128/b=16 the fast family scores
    recall@0.7 = 0.964 (identical to md5) at precision 0.931 (md5: 0.857) —
    BENCH/MINHASH_QUALITY.md, same ground truth.

    Shape note: this is deliberately explode -> 128 x min(xxhash64(h, i))
    hash-aggregate, NOT array_min(transform(...)) per seed — higher-order
    functions are CodegenFallback (interpreted, boxed per element), measured
    ~10x slower than the codegen'd aggregate at 10^5 docs; the groupBy is
    cheap because exploded rows of a doc are co-located, so map-side partial
    min collapses the shuffle to ~one row per doc before it moves."""
    sh = df.select(
        F.col("doc_id"), shingles(F.col(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    ex = sh.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", F.xxhash64("s").alias("h")
    )
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh{i}") for i in range(k)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    k: int = N_MINHASH,
    bands: int = N_BANDS,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash (equi-join on band hash).

    ``signatures``: pre-computed signature table (doc_id, mh0..mh{k-1}) — pass
    ``minhash_signatures_fast(...)`` output for the shuffle-free scale path;
    defaults to the cross-engine md5 family."""
    rows = k // bands
    sig = signatures if signatures is not None else minhash_signatures(df, text_col, k)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("_", *parts)).alias("bh"))
        )
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band")).select(
        "doc_id", F.col("band.band_id").alias("band_id"), F.col("band.bh").alias("bh")
    )
    # the self-join would otherwise recompute the whole shingle->minhash
    # subtree once per side; the banded table is tiny (docs x bands rows)
    banded = banded.persist()
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _simhash_band(harr: Column, shift: int) -> Column:
    """16-bit SimHash band from bits [shift, shift+16) of precomputed
    per-token hashes: bit i of the band = (sum over tokens of +/-1 by that
    token's hash bit) > 0."""
    def bit_merge(bit_pos: int):
        # factory (not a default arg): pyspark infers lambda arity from the
        # signature, so the merge fn must be strictly binary
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit_pos).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    terms = []
    for i in range(16):
        contrib = F.aggregate(harr, F.lit(0), bit_merge(shift + i))
        terms.append(F.when(contrib > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for t in terms:
        out = out + t
    return out.cast("long")


def simhash_docs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc 64-bit SimHash signature, banded: (doc_id, h0..h3).

    Two md5-derived hashes per token (md5_int yields 60 usable bits, so a
    second salted hash supplies the upper 32 signature bits): bands 0-1 use
    bits 0..31 of md5(w), bands 2-3 use bits 0..31 of md5(w || '#hi').
    The token hash arrays are materialized in their OWN projection so the 64
    bit-sum folds reference cheap array columns — inlining them would make
    every fold recompute the md5s (measured 4x slower); CollapseProject does
    not duplicate non-cheap expressions referenced many times.
    """
    words = F.array_distinct(F.split(norm_text(F.col(text_col)), " "))
    hashed = df.select(
        "doc_id",
        F.transform(words, lambda w: md5_int(w)).alias("_ha"),
        F.transform(words, lambda w: md5_int(F.concat(w, F.lit("#hi")))).alias("_hb"),
    )
    return hashed.select(
        "doc_id",
        _simhash_band(F.col("_ha"), 0).alias("h0"),
        _simhash_band(F.col("_ha"), 16).alias("h1"),
        _simhash_band(F.col("_hb"), 0).alias("h2"),
        _simhash_band(F.col("_hb"), 16).alias("h3"),
    )


def simhash_pairs(df: DataFrame, text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash hamming distance.

    Scale path: equi-join on each 16-bit band (pigeonhole — any pair within
    hamming<=3 over 4 bands shares at least one exactly-equal band). 65536
    buckets per band keeps candidate volume sub-quadratic; the 16-bit
    signature this replaces had only 256 buckets per half and produced
    O(n^2/256) candidates (4.2M pairs at sf0.1 — measured in round 1)."""
    s = simhash_docs(df, text_col)
    # persist: the four join branches below would recompute the signature
    keyed = s.persist()
    band_cols = [f"h{k}" for k in range(SIMHASH_BANDS)]
    pairs = None
    for part in band_cols:
        a, b = keyed.alias("a"), keyed.alias("b")
        p = a.join(
            b,
            (F.col(f"a.{part}") == F.col(f"b.{part}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.{c}").alias(f"a_{c}") for c in band_cols],
            *[F.col(f"b.{c}").alias(f"b_{c}") for c in band_cols],
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = sum(
        F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}"))) for c in band_cols
    )
    return (
        pairs.distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
