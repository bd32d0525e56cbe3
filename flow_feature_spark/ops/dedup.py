"""Deduplication operators (exact + near-dup families).

All variants are shuffle-architected for web scale:

* exact       — one hash-groupBy on the content fingerprint.
* n-gram Jaccard — explode word shingles, self-join on shingle (the join key
  is the shingle hash, so co-occurrence is a co-partitioned equi-join),
  count intersections, filter by threshold. No pairwise cross join ever.
* MinHash+LSH — k md5-derived min-hashes per doc, banded into b band keys;
  candidate pairs come from an equi-join on (band_id, band_hash) — the
  classic sub-quadratic path; verified with exact Jaccard on candidates.
* SimHash     — per-token hashes bit-summed into a 16-bit signature;
  near-dup = small hamming distance (bit_count(xor)).
* embedding cosine — see ops.similarity (shares the dot-product kernel).

Hash discipline: md5 hex -> int64 via base-16 parse, reproducible in any
engine (the DuckDB oracles use the identical construction), unlike
engine-native hash() functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flow_feature_spark.ops.text import norm_text

N_MINHASH = 8
N_BANDS = 4  # rows per band = N_MINHASH // N_BANDS = 2
SHINGLE_K = 3


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
    df: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Doc pairs with word-3-gram Jaccard >= threshold.

    explode -> equi-join on shingle -> per-pair intersection counts -> exact
    Jaccard. The shingle join is the scale path: pairs are generated only for
    docs that actually share a shingle.
    """
    sh = _doc_shingles(df, text_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
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


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    k: int = N_MINHASH,
    bands: int = N_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash (equi-join on band hash)."""
    rows = k // bands
    sig = minhash_signatures(df, text_col, k)
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


def simhash16(text: Column) -> Column:
    """16-bit SimHash over word tokens (md5-derived per-token hashes)."""
    words = F.array_distinct(F.split(norm_text(text), " "))
    h = lambda w: md5_int(w)  # noqa: E731
    bits = []
    for i in range(16):
        # sum over tokens of (+1 if bit set else -1); bit i of signature = sum>0
        contrib = F.aggregate(
            words,
            F.lit(0),
            lambda acc, w: acc
            + F.when(F.shiftright(h(w), i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        bits.append(F.when(contrib > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def simhash_docs(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "doc_id", simhash16(F.col(text_col)).alias("simhash"),
    )


def simhash_pairs(df: DataFrame, text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Scale path: join on each half of the signature (pigeonhole — any pair
    within hamming<=3 of 16 bits shares at least one exact 8-bit half).
    """
    s = simhash_docs(df, text_col)
    lo = (F.col("simhash").bitwiseAND(F.lit(0xFF))).alias("h0")
    hi = F.shiftright(F.col("simhash"), 8).alias("h1")
    # persist: four join branches below would recompute the 16-bit simhash
    keyed = s.select("doc_id", "simhash", lo, hi).persist()
    pairs = None
    for part in ("h0", "h1"):
        a, b = keyed.alias("a"), keyed.alias("b")
        p = a.join(
            b,
            (F.col(f"a.{part}") == F.col(f"b.{part}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
