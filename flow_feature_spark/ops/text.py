"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting. Pure column expressions — JVM-side, codegen'd,
scale-free (embarrassingly parallel over the scan, no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: word pieces OR single non-space punctuation.
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# tiny per-language marker vocabularies for the n-gram/keyword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "des"],
    "de": ["der", "die", "und", "das"],
    "zh": [],  # CJK detected by script, below
}


def _r6(c: Column) -> Column:
    return F.floor(c * 1e6 + 0.5) / 1e6


def norm_text(text: Column) -> Column:
    """Lowercased, whitespace-collapsed canonical form (dedup key basis)."""
    return F.trim(F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"\s+", " "))


def ws_token_count(text: Column) -> Column:
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pieces via regexp extraction."""
    return F.size(
        F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(BPE_TOKEN_RE), F.lit(0))
    ).cast("long")


def punct_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return _r6(n_punct.cast("double") / F.greatest(F.length(t), F.lit(1)))


def stopword_ratio(text: Column) -> Column:
    t = F.concat(F.lit(" "), norm_text(text), F.lit(" "))
    hits = sum(
        (F.size(F.split(t, f"\\s{w}\\s")) - 1 for w in STOPWORDS),
        start=F.lit(0),
    )
    return _r6(hits.cast("double") / F.greatest(ws_token_count(text), F.lit(1)))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct + stopword
    presence (the usual cheap pre-filter for web-scale corpora)."""
    n = ws_token_count(text)
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when((punct_ratio(text) < 0.2) & (n > 0), F.lit(0.3)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) > 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    return _r6(len_ok + punct_ok + stop_ok)


def lang_id(text: Column) -> Column:
    """Marker-word / script heuristic language ID (deterministic, SQL-par)."""
    t = F.concat(F.lit(" "), norm_text(text), F.lit(" "))

    def hits(words: list[str]) -> Column:
        return sum(
            (F.size(F.split(t, f"\\s{w}\\s")) - 1 for w in words), start=F.lit(0)
        )

    cjk = F.length(F.regexp_replace(F.coalesce(text, F.lit("")), r"[^一-鿿]", ""))
    en, es, fr, de = (hits(LANG_MARKERS[k]) for k in ("en", "es", "fr", "de"))
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when((es > en) & (es >= fr) & (es >= de), F.lit("es"))
        .when((fr > en) & (fr >= de), F.lit("fr"))
        .when(de > en, F.lit("de"))
        .when(en > 0, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint (md5 of canonical form)."""
    return F.md5(norm_text(text))


# Rolling-hash modulus: < 2^40 so acc*31 + tok stays far below int64 in both
# engines (no overflow, no wrap divergence).
ROLL_MOD = 1_099_511_627_689
ROLL_BASE = 31


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    h = fold(tokens, (acc, t) -> (acc*31 + md5_60bit(t) % M) % M), seeded
    with the FIRST token's value (matching DuckDB's list_reduce convention,
    which has no explicit initial accumulator). Unlike fp_md5 this changes
    when token ORDER changes, the classic shape for shift-tolerant dedup
    pipelines."""
    words = F.split(norm_text(text), " ")
    h = lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")  # noqa: E731
    mapped = F.transform(words, lambda w: h(w) % F.lit(ROLL_MOD))
    rest = F.slice(mapped, 2, F.greatest(F.size(mapped) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        F.element_at(mapped, 1),
        lambda acc, x: (acc * ROLL_BASE + x) % F.lit(ROLL_MOD),
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> per-doc text-analysis feature row."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        ws_token_count(t).alias("n_ws_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        F.length(F.coalesce(t, F.lit(""))).cast("long").alias("n_chars_actual"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp_md5"),
        rolling_fingerprint(t).alias("fp_roll"),
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    log_idf: bool = False,
) -> DataFrame:
    """Per-document top-``k`` terms by tf-idf: (doc_id, token, tf, df,
    score, rank). Default idf is the RATIONAL form tf·N/df — cast to
    double in a pinned order ((tf·N)/df), so both engines produce
    bit-identical scores (ln is transcendental: Spark's Math.log and
    DuckDB's std::log may differ in the last ulp, which flips ranks at
    ties — the classic ``log_idf=True`` form tf·ln(N/df) stays
    engine-side only, never an oracle).

    Shape at scale: tokenization is map-side; tf = one (doc, token) hash
    aggregate; document frequency = one aggregate of the tf table (already
    one row per doc×token, so count(*) per token IS the df); N broadcasts
    as a literal 1-row frame; the df join is token-keyed (broadcast-able
    while the vocabulary fits, AQE skew-split otherwise — stopword tokens
    are the hot keys); top-k ranks within each doc, partitioned by doc id.
    Ties break on the token string, keeping the cut deterministic."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tok = F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("token")
    # r7: persist the tf table — it feeds BOTH the score join and the
    # document-frequency aggregate, and Catalyst inlines the shared subtree,
    # re-tokenizing the whole corpus for the second reference (measured: the
    # tokenize+explode+aggregate pass was 2.0 s of the 3.9 s query at sf1.0,
    # paid twice; plans/r07/tfidf_topk_before.txt nodes 1-6 vs 7-15).
    # MEMORY_AND_DISK: at corpus scale the tf table spills rather than
    # re-tokenizing trillions of raw tokens (guide §5: cache when recompute
    # cost exceeds the memory pressure — one |doc x token| table vs a second
    # full tokenize of the corpus).
    tf = (
        df.select(F.col(id_col), tok)
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .persist()
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).cast("bigint").alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
    )
    if log_idf:
        raw = F.col("tf").cast("double") * F.log(
            F.col("n_docs").cast("double") / F.col("df").cast("double")
        )
    else:
        raw = (
            F.col("tf").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("df").cast("double")
        )
    scored = scored.withColumn("score", _r6(raw))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )


def token_vocabulary(df: DataFrame, text_col: str = "text", top_n: int = 50) -> DataFrame:
    """Corpus-level token frequency table, top-``top_n`` by count (the
    classic vocabulary-building pass of a BPE/tokenizer pipeline).

    Shape at scale: explode is map-side; the count is one hash aggregate
    with map-side partial combine (token cardinality ~ vocabulary size);
    the top-N cut is ``orderBy(...).limit(top_n)``, which Catalyst compiles
    to TakeOrderedAndProject — every partition keeps a local top-``top_n``
    heap and only those survive to the driver-side merge, so no single task
    ever sorts the whole vocabulary (a web corpus has billions of distinct
    tokens; a global rank window would hold them all in one task). The
    rank column is then a window over the already-cut ``top_n`` rows —
    bounded by ``top_n``, not |vocab|. Tiebreak on the token string keeps
    the cut deterministic.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    tok = F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("token")
    counts = (
        df.select(tok)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
    # explicit single constant partition: the frame is already cut to top_n
    # rows, so one task is correct AND bounded. The key must be non-foldable
    # (a literal gets optimized away, resurrecting the empty partition spec
    # and its "No Partition Defined" scale warning — spurious here, but the
    # warning's absence is what lets a bench tail flag REAL global windows)
    w = Window.partitionBy(
        F.substring(F.col("token"), 1, 0)
    ).orderBy(F.desc("n"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def turn_overlap(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts_us",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Turn-to-turn repetition features: each turn's token overlap with the
    PREVIOUS turn of its conversation — n_tokens, n_shared, n_union,
    ``jaccard_prev`` (r6) and ``is_exact_repeat``.

    Why: self-repetition is a first-order training-data-quality signal for
    agent transcripts (stuck loops, copy-paste turns, degenerate sampling) —
    the sequential sibling of the corpus-level dedup family (C3-C7), which
    compares documents, not adjacent turns. One lag window over the same
    (conv, ts, idx) ordering the sessionizer uses = one exchange.

    Exactness: tokens are the distinct non-empty pieces of the
    whitespace-split lowercased trimmed text (the C1 normalization);
    overlap/union are exact integer set sizes (order-insensitive), Jaccard
    is one r6-rounded double divide — bit-identical cross-engine (driver
    query ``turn_repetition``). First turns emit NULL overlap columns
    (nothing to compare against), never fake zeros.

    Reference basis: flow.py:326 consumes only per-packet LENGTH; content
    similarity between adjacent packets has no reference analog — this is a
    transcript-native addition.
    """
    from pyspark.sql import Window

    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.array_distinct(
        F.array_remove(F.split(F.trim(F.lower(t)), r"\s+"), "")
    )
    w = Window.partitionBy(conv_col).orderBy(ts_col, idx_col)
    out = (
        df.withColumn("_toks", toks)
        .withColumn("_ptoks", F.lag("_toks").over(w))
        .withColumn("_ptxt", F.lag(t).over(w))
    )
    has_prev = F.col("_ptoks").isNotNull()
    n_shared = F.size(F.array_intersect("_toks", "_ptoks")).cast("long")
    n_union = F.size(F.array_union("_toks", "_ptoks")).cast("long")
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    jac = F.when(
        has_prev & (n_union > 0),
        r6(n_shared.cast("double") / n_union.cast("double")),
    )
    return (
        out.withColumn("n_tokens", F.size("_toks").cast("long"))
        .withColumn("n_shared", F.when(has_prev, n_shared))
        .withColumn("n_union", F.when(has_prev, n_union))
        .withColumn("jaccard_prev", jac)
        .withColumn(
            "is_exact_repeat",
            F.when(F.col("_ptxt").isNotNull(), t == F.col("_ptxt")),
        )
        .drop("_toks", "_ptoks", "_ptxt")
    )
