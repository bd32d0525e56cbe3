"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force baseline: query set x corpus, dot
  products via ``F.zip_with`` + ``F.aggregate`` (JVM-side fold, no Python),
  row_number top-k with deterministic tiebreak. The cross join broadcasts the
  (small) query side; corpus side streams — the right baseline shape even at
  10^9 corpus rows.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane (sign-LSH) bucket
  keys from md5-derived deterministic hyperplanes; candidates = equi-join on
  bucket key, then exact re-rank. Sub-linear candidate sets at the cost of
  recall (measured in tests against the brute-force baseline).
* ``embedding_near_dup_pairs`` — near-duplicate pairs by cosine >= threshold
  over LSH buckets.

Float32 products are exact in double (24+24 mantissa bits), so cross-engine
sums differ only at ~1e-14 — far below the r6 rounding grid used for output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HYPERPLANES = 8


def _r6(c: Column) -> Column:
    return F.floor(c * 1e6 + 0.5) / 1e6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return _r6(_dot(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b))))


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors."""
    from pyspark.sql import Window as W

    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in [-1, 1).

    Derived from md5 of (plane, index) on the DRIVER (plain hashlib) — tiny,
    broadcast as a literal array; reproducible everywhere.
    """
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"hp{plane}#{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def lsh_bucket_key(
    vec: Column, dim: int, n_planes: int = N_HYPERPLANES, plane_offset: int = 0
) -> Column:
    """Sign-LSH bucket id: bit i = (vec . hyperplane_{offset+i}) >= 0."""
    key = F.lit(0)
    for p in range(n_planes):
        hp = F.array(*[F.lit(v) for v in _hyperplane(dim, plane_offset + p)])
        key = key + F.when(_dot(vec, hp) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return key.cast("int")


def lsh_bucket_keys(
    vec: Column, dim: int, n_tables: int = 4, planes_per_table: int = 4
) -> Column:
    """Multi-table sign-LSH: array of (table_id, key) structs.

    L independent tables of r planes each — collision prob per table is
    (1 - theta/pi)^r, union over tables lifts recall the classic way.
    """
    entries = []
    for t in range(n_tables):
        k = lsh_bucket_key(vec, dim, planes_per_table, plane_offset=t * planes_per_table)
        entries.append(F.struct(F.lit(t).alias("table_id"), k.alias("key")))
    return F.array(*entries)


def lsh_bucket_topk(
    emb: DataFrame,
    dim: int,
    n_queries: int = 8,
    k: int = 5,
    n_tables: int = 4,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share any LSH table bucket, exact re-rank.

    Scale shape: the exploded (table_id, key) join is an equi-join — each
    bucket is a co-partitioned cell, never a cross join; the query side is
    tiny and broadcast.
    """
    from pyspark.sql import Window as W

    keyed = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.explode(lsh_bucket_keys(F.col(vec_col), dim, n_tables, planes_per_table)).alias("b"),
    ).select("vid", "v", F.col("b.table_id").alias("table_id"), F.col("b.key").alias("key"))
    q = keyed.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"), "table_id", "key"
    )
    cand = (
        keyed.join(F.broadcast(q), ["table_id", "key"])
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("cand_id"), "qv", "v")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cand.select(
        "query_id", "cand_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


IVF_ANCHOR_NS = 10_000  # hyperplane-namespace offset for IVF anchors


def _ivf_anchor(dim: int, a: int) -> list[float]:
    """Deterministic UNIT-NORM anchor vector #a (md5-derived, data-independent
    — a random-projection coarse quantizer, so the DuckDB oracle can embed the
    identical literals)."""
    import math

    raw = _hyperplane(dim, IVF_ANCHOR_NS + a)
    norm = math.sqrt(sum(x * x for x in raw)) or 1.0
    return [x / norm for x in raw]


def ivf_topk(
    emb: DataFrame,
    dim: int,
    n_queries: int = 8,
    k: int = 5,
    n_anchors: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via an IVF-style coarse quantizer: every vector is assigned
    to its nearest anchor (cell), queries probe their ``nprobe`` nearest
    cells, candidates = cell equi-join, exact cosine re-rank.

    Scale shape: the corpus does K dot products per row once (embarrassingly
    parallel, no shuffle), candidates come from a co-partitioned equi-join on
    cell id — the classic inverted-file layout; expected candidate volume is
    ~nprobe/n_anchors of the corpus per query. Anchors are unit-norm
    md5-derived constants, so cell assignment is reproducible in any engine.
    """
    from pyspark.sql import Window as W

    anchors = [_ivf_anchor(dim, a) for a in range(n_anchors)]

    def dots_arr(v: Column) -> Column:
        return F.array(
            *[_dot(v, F.array(*[F.lit(x) for x in anc])) for anc in anchors]
        )

    # materialize the dot array in its own projection (same CollapseProject
    # rationale as simhash: argmax references it twice)
    based = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
        dots_arr(F.col(vec_col)).alias("_dots"),
    )
    keyed = based.select(
        "vid", "v",
        F.array_position(F.col("_dots"), F.array_max(F.col("_dots")))
        .cast("int").alias("cell"),
    )
    qd = based.filter(F.col("vid") < n_queries)
    cand_cells = F.array(
        *[
            F.struct(
                (-F.element_at(F.col("_dots"), a + 1)).alias("nd"),
                F.lit(a + 1).alias("cell"),
            )
            for a in range(n_anchors)
        ]
    )
    probes = qd.select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"),
        F.explode(
            F.transform(
                F.slice(F.sort_array(cand_cells), 1, nprobe), lambda s: s["cell"]
            )
        ).alias("cell"),
    )
    cand = (
        keyed.join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("cand_id"), "qv", "v")
    )
    scored = cand.select(
        "query_id", "cand_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_tables: int = 4,
    planes_per_table: int = 16,
    max_bucket_size: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs (cos >= threshold) via multi-table sign-LSH.

    Scale shape: L independent tables of r planes each (2^r buckets per
    table) — the single 8-plane table this replaces had 256 buckets, making
    the within-bucket self-join O(n^2/256). Recall comes from the table
    union, precision from the exact cosine filter. Buckets larger than
    ``max_bucket_size`` are dropped from candidate generation (their members
    still pair through other tables): the within-bucket join is quadratic in
    bucket size, so one degenerate bucket (e.g. the all-zeros region) would
    otherwise dominate the whole job. The oversized-bucket set is tiny by
    construction -> broadcast anti-join, no extra big shuffle.
    """
    keyed = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.explode(
            lsh_bucket_keys(F.col(vec_col), dim, n_tables, planes_per_table)
        ).alias("b"),
    ).select("vid", "v", F.col("b.table_id").alias("table_id"), F.col("b.key").alias("key"))
    big = (
        keyed.groupBy("table_id", "key")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > max_bucket_size)
        .select("table_id", "key")
    )
    capped = keyed.join(F.broadcast(big), ["table_id", "key"], "left_anti")
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .select(
            "vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
