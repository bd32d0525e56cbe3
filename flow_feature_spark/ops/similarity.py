"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force baseline: query set x corpus, dot
  products via the ``F.zip_with`` + ``F.aggregate`` fold (measured ~2x
  faster than a fully unrolled expression on Spark 4.1 — see ``_dot``),
  row_number top-k with deterministic tiebreak. The cross join broadcasts
  the (small) query side; corpus side streams — the right baseline shape
  even at 10^9 corpus rows.
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


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array columns.

    MEASURED (1M x 64-dim, 16 queries, Spark 4.1, BENCH/ANN_SCALE.md): the
    higher-order-function fold is ~2x FASTER than unrolling into dim
    GetArrayItem+Multiply+Add terms — the HOF walks each primitive float
    array once, while every unrolled GetArrayItem repeats null/bounds checks
    and the giant expression tree bloats task binaries (6.5 MB) and compile
    time. The reverse holds for a LITERAL vector operand (``_dot_lit``).
    The minhash "HOF is 10x slower" result (BENCH/MINHASH_QUALITY.md) came
    from per-element xxhash64 calls inside transform, not arithmetic folds —
    don't generalize it. Both forms sum left-to-right from 0.0 in index
    order, so the doubles are bit-identical (checksum-verified) and the
    DuckDB oracle (list_sum over an in-order list_transform) agrees either
    way. ``dim`` unrolling is kept for plan experiments; production paths
    pass dim=None.
    """
    if dim is not None:
        t = F.lit(0.0)
        for j in range(dim):
            t = t + a.getItem(j).cast("double") * b.getItem(j).cast("double")
        return t
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_lit(a: Column, consts: list[float]) -> Column:
    """Dot of an array column with a DRIVER-side constant vector, unrolled:
    every term is element * literal — pure codegen, no HOF, no array literal
    per row. MEASURED 2.5-3x faster than the HOF fold against an array
    literal for the 64-plane LSH key computation at 1M x 64-dim
    (BENCH/ANN_SCALE.md) — the opposite of the array-x-array case (_dot),
    because the literal side folds into the generated code."""
    t = F.lit(0.0)
    for j, c in enumerate(consts):
        t = t + a.getItem(j).cast("double") * F.lit(float(c))
    return t


def _dot_lit_sql(vec_sql: str, consts: list[float]) -> str:
    """SQL text of ``_dot_lit`` (same left-to-right order, same doubles —
    repr() round-trips and the D suffix makes each literal a double).

    Why text: building the unrolled tree with Column operators costs one
    py4j round-trip per node — measured 18.5 s of pure DRIVER time to
    construct the 64-plane near-dup plan. One F.expr parse is milliseconds.
    """
    terms = "".join(
        f" + (CAST({vec_sql}[{j}] AS DOUBLE) * {float(c)!r}D)"
        for j, c in enumerate(consts)
    )
    return "(0.0D" + terms + ")"


def lsh_bucket_key_sql(
    vec_sql: str, dim: int, n_planes: int = N_HYPERPLANES, plane_offset: int = 0
) -> str:
    """SQL text of ``lsh_bucket_key`` over the column expression ``vec_sql``
    — value-identical, built as one string so plan construction stays on the
    JVM (see _dot_lit_sql)."""
    bits = " + ".join(
        f"(CASE WHEN {_dot_lit_sql(vec_sql, _hyperplane(dim, plane_offset + p))}"
        f" >= 0D THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"CAST(({bits}) AS INT)"


def _norm2(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        t = F.lit(0.0)
        for j in range(dim):
            x = a.getItem(j).cast("double")
            t = t + x * x
        return t
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return _r6(
        _dot(a, b, dim) / (F.sqrt(_norm2(a, dim)) * F.sqrt(_norm2(b, dim)))
    )


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors."""
    from pyspark.sql import Window as W

    # r7: precompute each side's sqrt(norm2) ONCE PER ROW before the cross
    # join — the norm is a per-vector quantity, but the inline ``cosine``
    # recomputed both folds for every (query, candidate) pair (n_queries x
    # for the corpus norm). Same expressions in the same order, so the
    # doubles — and the r6-rounded cos_sim — are bit-identical (guide §2.3:
    # don't compute per-key work per-pair).
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.sqrt(_norm2(F.col(vec_col), dim)).alias("_qsn"),
    )
    c = emb.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"),
        F.sqrt(_norm2(F.col(vec_col), dim)).alias("_csn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id",
            _r6(
                _dot(F.col("qv"), F.col("cv"), dim)
                / (F.col("_qsn") * F.col("_csn"))
            ).alias("cos_sim"),
        )  # dim=None default -> HOF fold (measured faster; see _dot)
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
        hp = _hyperplane(dim, plane_offset + p)
        key = key + F.when(_dot_lit(vec, hp) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return key.cast("int")


def lsh_bucket_keys(
    vec: Column, dim: int, n_tables: int = 4, planes_per_table: int = 4
) -> Column:
    """Multi-table sign-LSH: array of (table_id, key) structs.

    L independent tables of r planes each — collision prob per table is
    (1 - theta/pi)^r, union over tables lifts recall the classic way.

    NOTE: at n_tables * planes_per_table * dim beyond ~1000 terms the single
    array expression exceeds Janino's 64 KB method limit once inlined into a
    Generate (whole-stage codegen cannot split expressions there), and Spark
    falls back to interpreted evaluation of the whole stage — measured
    catastrophic at 64 planes x 64 dims. Use ``lsh_keyed_by_table`` for the
    production path; this Column form remains for small-parameter uses and
    the cross-engine oracle.
    """
    entries = []
    for t in range(n_tables):
        k = lsh_bucket_key(vec, dim, planes_per_table, plane_offset=t * planes_per_table)
        entries.append(F.struct(F.lit(t).alias("table_id"), k.alias("key")))
    return F.array(*entries)


def lsh_keyed_by_table(
    emb: DataFrame,
    dim: int,
    n_tables: int = 4,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, v, table_id, key) — one row per vector per LSH table.

    Built as a UNION of per-table selects instead of one explode: each branch
    is its own whole-stage-codegen stage of planes_per_table * dim unrolled
    terms, safely under the 64 KB generated-method limit, where the single
    exploded array expression of every table's key is not. Row-for-row and
    value-for-value identical to exploding ``lsh_bucket_keys`` (same
    md5-derived planes, same dot order). Downstream data volume is the same
    L-fold duplication either way; the union pays L column-pruned scans of
    (id, vec) instead, which columnar sources read cheaply.
    """
    branches = []
    for t in range(n_tables):
        k = F.expr(
            lsh_bucket_key_sql(
                f"`{vec_col}`", dim, planes_per_table, plane_offset=t * planes_per_table
            )
        )
        branches.append(
            emb.select(
                F.col(id_col).alias("vid"),
                F.col(vec_col).alias("v"),
                F.lit(t).alias("table_id"),
                k.alias("key"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def lsh_bucket_topk(
    emb: DataFrame,
    dim: int,
    n_queries: int = 8,
    k: int = 5,
    n_tables: int = 4,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_flips: int = 0,
) -> DataFrame:
    """ANN top-k: candidates share any LSH table bucket, exact re-rank.

    Scale shape: the (table_id, key) join is an equi-join — each bucket is a
    co-partitioned cell, never a cross join; the query side is tiny and
    broadcast. Query bucket keys are computed on the DRIVER from the
    collected query vectors (n_queries is small by API contract): keying the
    filtered frame in-engine would compile a second full set of per-table
    plane-dot methods just to key a handful of rows — the generated-code
    fixed cost, not the data, dominates there (measured 191.6s -> 99.9s at
    10^6 vectors, BENCH/ANN_SCALE.md). Python float64 arithmetic in the
    same left-to-right order reproduces the identical IEEE doubles and
    therefore identical sign bits (the cross-engine hash gate pins this).

    ``multiprobe_flips``: classic multiprobe LSH — per table, additionally
    probe the buckets reached by flipping each of the ``multiprobe_flips``
    sign bits with the smallest |dot| margin (a near-zero plane dot means
    a true neighbor plausibly landed on the other side). Probes per query
    grow from L to L * (1 + flips); recall rises without more tables, the
    corpus side is untouched, and extra probes are only extra rows on the
    broadcast side. flips=0 (default, the driver-oracled form) is the plain
    one-bucket-per-table probe.
    """
    from pyspark.sql import Window as W

    keyed = lsh_keyed_by_table(
        emb, dim, n_tables, planes_per_table, id_col=id_col, vec_col=vec_col
    )
    qrows = (
        emb.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    probe_rows = []
    for row in qrows:
        qv = [float(x) for x in row["qv"]]
        for t in range(n_tables):
            key, margins = 0, []
            for p in range(planes_per_table):
                d = 0.0
                for x, c in zip(qv, _hyperplane(dim, t * planes_per_table + p)):
                    d = d + x * c
                if d >= 0:
                    key += 1 << p
                margins.append((abs(d), p))
            keys = {key}
            margins.sort()
            for _, p in margins[:multiprobe_flips]:
                keys.add(key ^ (1 << p))
            for kk in sorted(keys):
                probe_rows.append((row["query_id"], row["qv"], t, kk))
    q = emb.sparkSession.createDataFrame(
        probe_rows, "query_id long, qv array<float>, table_id int, key int"
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
    chunk_anchors: int = 16,
    anchors: list[list[float]] | None = None,
) -> DataFrame:
    """ANN top-k via an IVF-style coarse quantizer: every vector is assigned
    to its nearest anchor (cell), queries probe their ``nprobe`` nearest
    cells, candidates = cell equi-join, exact cosine re-rank. Anchors are
    unit-norm md5-derived constants, so cell assignment is reproducible in
    any engine.

    Scale shape, in two regimes:

    * ``n_anchors <= chunk_anchors``: all anchor dots in one projected array
      — K x dim unrolled terms, embarrassingly parallel, no extra shuffle.
      This is the driver-oracled path (ivf_topk_sql mirrors it literally).
    * larger K: a single K x dim expression exceeds Janino's 64 KB method
      limit (measured: 64 anchors x 64 dims fell off codegen and OOMed a
      48 GB heap in interpreted fallback at 10^6 rows). The argmax is
      instead computed as chunks of ``chunk_anchors`` anchors — each chunk a
      compilable ``greatest(struct(dot, -cell))`` — unioned and max-reduced
      per vector (map-side partial max, skew-free vid keys), then joined
      back to the vectors. Two extra skinny shuffles, every generated method
      bounded; identical values and tie-breaks (highest dot, then smallest
      cell = first-occurrence array_position semantics).

    Query probe cells are computed on the DRIVER from the collected query
    vectors — n_queries is small by API contract (it is the broadcast side),
    and Python float arithmetic in the same left-to-right order produces the
    identical IEEE doubles, so probe sets match the in-engine form exactly.
    """
    from pyspark.sql import Window as W

    # data-adapted anchors (e.g. ops/kmeans.kmeans_fit centroids, dequantized)
    # drop in for the md5 defaults; cell semantics are unchanged
    if anchors is None:
        anchors = [_ivf_anchor(dim, a) for a in range(n_anchors)]
    else:
        if any(len(a) != dim for a in anchors):
            raise ValueError(f"every anchor must have dim {dim}")
        n_anchors = len(anchors)

    # -- query probes: driver-side top-nprobe cells per query --------------
    spark = emb.sparkSession
    qrows = (
        emb.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    probe_rows = []
    for row in qrows:
        qv = [float(x) for x in row["qv"]]
        scored_cells = []
        for a, anc in enumerate(anchors):
            d = 0.0
            for x, c in zip(qv, anc):
                d = d + x * c
            scored_cells.append((-d, a + 1))
        scored_cells.sort()
        for _, cell in scored_cells[:nprobe]:
            probe_rows.append((row["query_id"], cell))
    # r7: ship only (query_id, cell) through createDataFrame — the query
    # VECTORS re-attach from the emb scan via a broadcast join (identical
    # values; they were collected from the same rows). Serializing the
    # n_queries x nprobe float arrays through py4j was ~0.45 s of pure
    # driver time per call at 64-dim (guide §5: the driver should do
    # almost no data work). The norms precompute mirrors cosine_topk.
    cells = spark.createDataFrame(probe_rows, "query_id long, cell int")
    qside = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.sqrt(_norm2(F.col(vec_col))).alias("_qsn"),
    )
    probes = cells.join(qside, "query_id")

    # -- corpus cell assignment --------------------------------------------
    if n_anchors <= chunk_anchors:
        # r7: emit the dot array as CONCAT of <=4-anchor sub-arrays — same
        # values in the same positions (concat preserves order), but each
        # generated sub-expression stays far under the JIT's 8 KB/64 KB
        # method limits, so the projection stays on compiled codegen instead
        # of falling back to interpreted eval (measured at sf1.0: warm
        # assignment 1.35 -> 1.06 s, first-call 5.6 -> 1.8 s — the single
        # K x dim method also cost a multi-second Janino compile).
        sub = [
            "array(" + ", ".join(
                _dot_lit_sql(f"`{vec_col}`", anc) for anc in anchors[lo:lo + 4]
            ) + ")"
            for lo in range(0, n_anchors, 4)
        ]
        dots_sql = sub[0] if len(sub) == 1 else "concat(" + ", ".join(sub) + ")"
        # materialize the dot array in its own projection (CollapseProject
        # keeps multi-referenced non-cheap arrays shared, as for simhash)
        based = emb.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
            F.expr(dots_sql).alias("_dots"),
        )
        # coalesce(x, 0) is an identity here (the anchor array is non-empty,
        # array_position always hits) but makes `cell` STATICALLY
        # non-nullable — without it the cell equi-join adds IsNotNull(cell),
        # and pushdown inlines the full K x dim argmax expression into the
        # scan's data filter: Catalyst then plans/codegens a multi-megabyte
        # duplicated tree (measured 7 s/call warm at 500 rows; 2 s with the
        # coalesce, identical results)
        keyed = based.select(
            "vid", "v",
            F.sqrt(_norm2(F.col("v"))).alias("_csn"),
            F.coalesce(
                F.array_position(F.col("_dots"), F.array_max(F.col("_dots")))
                .cast("int"),
                F.lit(0),
            ).alias("cell"),
        )
    else:
        chunks = []
        for lo in range(0, n_anchors, chunk_anchors):
            structs = ", ".join(
                f"named_struct('d', {_dot_lit_sql(f'`{vec_col}`', anc)},"
                f" 'negcell', {-(lo + i + 1)})"
                for i, anc in enumerate(anchors[lo:lo + chunk_anchors])
            )
            best = structs if lo + 1 == min(lo + chunk_anchors, n_anchors) \
                else f"greatest({structs})"
            chunks.append(
                emb.select(
                    F.col(id_col).alias("vid"), F.expr(best).alias("best")
                )
            )
        allc = chunks[0]
        for c in chunks[1:]:
            allc = allc.unionByName(c)
        assign = allc.groupBy("vid").agg(
            (-F.max("best")["negcell"]).cast("int").alias("cell")
        )
        keyed = emb.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
            F.sqrt(_norm2(F.col(vec_col))).alias("_csn"),
        ).join(assign, "vid")

    cand = (
        keyed.join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id", F.col("vid").alias("cand_id"), "qv", "v",
            "_qsn", "_csn",
        )
    )
    scored = cand.select(
        "query_id", "cand_id",
        _r6(
            _dot(F.col("qv"), F.col("v")) / (F.col("_qsn") * F.col("_csn"))
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def lsh_probes_by_table(
    emb: DataFrame,
    dim: int,
    n_tables: int = 4,
    planes_per_table: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_flips: int = 1,
) -> DataFrame:
    """(vid, v, table_id, key) with MULTIPROBE keys: per table, each vector
    emits its home bucket plus the buckets reached by flipping each of the
    ``multiprobe_flips`` sign bits with the smallest |dot| margin — a
    near-zero plane dot means a true neighbor plausibly landed on the other
    side of that hyperplane. Rows per vector grow from L to at most
    L * (1 + flips).

    Codegen shape: the r plane dots are materialized as ONE array column in
    their own projection (unrolled literal mult-adds — whole-stage codegen,
    same generated-method budget as ``lsh_keyed_by_table``'s branches); the
    key and the margin sort then only index that array, so the expensive
    arithmetic runs once per row even though two expressions reference it.
    The margin sort itself is an interpreted HOF over r tiny structs —
    negligible next to the r*dim codegen'd dot terms.
    """
    if multiprobe_flips < 0:
        raise ValueError("multiprobe_flips must be >= 0")
    r = planes_per_table
    branches = []
    for t in range(n_tables):
        dots_sql = "array(" + ", ".join(
            _dot_lit_sql(f"`{vec_col}`", _hyperplane(dim, t * r + p))
            for p in range(r)
        ) + ")"
        d = emb.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            F.expr(dots_sql).alias("_dots"),
        )
        key_sql = "CAST((" + " + ".join(
            f"(CASE WHEN _dots[{p}] >= 0D THEN {1 << p} ELSE 0 END)"
            for p in range(r)
        ) + ") AS INT)"
        flips_sql = (
            f"slice(array_sort(transform(sequence(0, {r - 1}), "
            f"p -> named_struct('m', abs(_dots[p]), 'p', p))), "
            f"1, {multiprobe_flips})"
        )
        k = d.select(
            "vid", "v",
            F.expr(key_sql).alias("key"),
            F.expr(flips_sql).alias("_flip"),
        )
        branches.append(
            k.select(
                "vid", "v", F.lit(t).alias("table_id"),
                F.explode(F.expr(
                    "array_union(array(key), "
                    "transform(_flip, s -> CAST(key ^ shiftleft(1, s.p) AS INT)))"
                )).alias("key"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


# chunk bound for the per-bucket dot matrix: 8M float64 cells = 64 MB
_MATRIX_CELL_BUDGET = 8_000_000


def _exact_dot_matrix(av, bv):
    """(n_a x n_b) dot matrix with the HOF fold's exact IEEE evaluation
    order: float32 -> float64 casts first, then a left-to-right column
    accumulation ``acc = acc + a[:, j] * b[:, j]`` — bit-identical doubles
    to ``aggregate(zip_with(...))`` on the JVM."""
    import numpy as np

    acc = np.zeros((av.shape[0], bv.shape[0]), dtype=np.float64)
    for col in range(av.shape[1]):
        acc = acc + av[:, col][:, None] * bv[:, col][None, :]
    return acc


def _empty_pairs(id_dtype):
    import pandas as pd

    return pd.DataFrame({
        "vec_a": pd.Series(dtype=id_dtype),
        "vec_b": pd.Series(dtype=id_dtype),
        "cos_sim": pd.Series(dtype="float64"),
    })


def _key_segments(keys):
    """(order, uniq, starts, ends): stable-sort segmentation of ``keys`` —
    rows of exact bucket ``uniq[i]`` are ``order[starts[i]:ends[i]]``."""
    import numpy as np

    order = np.argsort(keys, kind="stable")
    uniq, starts = np.unique(keys[order], return_index=True)
    ends = np.append(starts[1:], len(keys))
    return order, uniq, starts, ends


def _bucket_pair_scorer(threshold: float, max_bucket_size: int):
    """Cogrouped scorer over a SUPER-group (table_id, key >> shift): rows are
    sub-bucketed by their exact key in numpy, then each exact bucket scores
    probe rows x home rows with the exact cosine, threshold filter, and
    canonicalized (min, max) pair output. Pairs are only ever formed within
    an exact (table_id, key) bucket — identical semantics at every shift;
    the super-grouping exists purely to amortize the per-group Arrow/pandas
    machinery at high plane counts (2^16 buckets/table = 262k groups
    measured ~65 s of pure group overhead at 10^6 vectors). The home-side
    bucket cap is applied per EXACT bucket (len > cap -> that bucket emits
    nothing), identical to the r6 broadcast anti-join semantics."""

    def score(probe_pdf, home_pdf):
        import numpy as np

        if len(home_pdf) == 0 or len(probe_pdf) == 0:
            return _empty_pairs(home_pdf["vid"].dtype if len(home_pdf) else
                                probe_pdf["vid"].dtype)
        hkey = home_pdf["key"].to_numpy()
        pkey = probe_pdf["key"].to_numpy()
        hv = np.stack(home_pdf["v"].to_numpy()).astype(np.float64)
        pv = np.stack(probe_pdf["v"].to_numpy()).astype(np.float64)
        hid = home_pdf["vid"].to_numpy()
        pid = probe_pdf["vid"].to_numpy()
        hsn = home_pdf["_sn"].to_numpy()
        psn = probe_pdf["_sn"].to_numpy()
        ho, hu, hs, he = _key_segments(hkey)
        po, pu, ps, pe = _key_segments(pkey)
        outs = []
        _, hix, pix = np.intersect1d(hu, pu, return_indices=True)
        for hi, pi_ in zip(hix, pix):
            hsl = ho[hs[hi]:he[hi]]
            h = len(hsl)
            if h > max_bucket_size:
                continue
            psl = po[ps[pi_]:pe[pi_]]
            Hv, Hid, Hsn = hv[hsl], hid[hsl], hsn[hsl]
            step = max(1, _MATRIX_CELL_BUDGET // h)
            for lo in range(0, len(psl), step):
                sl = psl[lo:lo + step]
                acc = _exact_dot_matrix(pv[sl], Hv)
                den = psn[sl][:, None] * Hsn[None, :]
                cos = np.floor((acc / den) * 1e6 + 0.5) / 1e6
                keep = (cos >= threshold) & (pid[sl][:, None] != Hid[None, :])
                ki, kj = np.nonzero(keep)
                if len(ki):
                    outs.append(_pair_frame(pid[sl][ki], Hid[kj], cos[keep]))
        return _concat_pairs(outs, home_pdf["vid"].dtype)

    return score


def _bucket_self_scorer(threshold: float, max_bucket_size: int):
    """Super-grouped scorer for the flips=0 path: per EXACT home bucket, all
    (vid_a < vid_b) pairs — the r6 self-join's exact condition (see
    ``_bucket_pair_scorer`` for the super-group rationale)."""

    def score(home_pdf):
        import numpy as np

        if len(home_pdf) < 2:
            return _empty_pairs(home_pdf["vid"].dtype)
        hkey = home_pdf["key"].to_numpy()
        hv = np.stack(home_pdf["v"].to_numpy()).astype(np.float64)
        hid = home_pdf["vid"].to_numpy()
        hsn = home_pdf["_sn"].to_numpy()
        ho, hu, hs, he = _key_segments(hkey)
        outs = []
        for bi in range(len(hu)):
            hsl = ho[hs[bi]:he[bi]]
            h = len(hsl)
            if h < 2 or h > max_bucket_size:
                continue
            Hv, Hid, Hsn = hv[hsl], hid[hsl], hsn[hsl]
            step = max(1, _MATRIX_CELL_BUDGET // h)
            for lo in range(0, h, step):
                acc = _exact_dot_matrix(Hv[lo:lo + step], Hv)
                den = Hsn[lo:lo + step][:, None] * Hsn[None, :]
                cos = np.floor((acc / den) * 1e6 + 0.5) / 1e6
                keep = (cos >= threshold) & (
                    Hid[lo:lo + step][:, None] < Hid[None, :]
                )
                ai, bj = np.nonzero(keep)
                if len(ai):
                    outs.append(_pair_frame(Hid[lo:lo + step][ai], Hid[bj],
                                            cos[keep], canonical=True))
        return _concat_pairs(outs, home_pdf["vid"].dtype)

    return score


def _pair_frame(va, vb, cos, canonical: bool = False):
    import numpy as np
    import pandas as pd

    if canonical:
        a, b = va, vb
    else:
        a, b = np.minimum(va, vb), np.maximum(va, vb)
    return pd.DataFrame({"vec_a": a, "vec_b": b, "cos_sim": cos})


def _concat_pairs(outs, id_dtype):
    import pandas as pd

    if not outs:
        return _empty_pairs(id_dtype)
    return pd.concat(outs, ignore_index=True)


def embedding_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_tables: int = 4,
    planes_per_table: int = 16,
    max_bucket_size: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_flips: int = 0,
    supergroup_bits: int = 11,
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

    ``supergroup_bits`` caps the cogrouped Spark-level group count at
    2^supergroup_bits per table (grouping on ``key >> (r - bits)``; exact
    buckets are re-segmented inside the scorer, so pair semantics are
    IDENTICAL at every value — at r <= bits the grouping is exactly the
    per-bucket one). Rationale: the per-group Arrow/pandas machinery is the
    fixed cost at high plane counts (r=16 -> 262k groups measured ~65 s at
    10^6 vectors); the trade is rows-per-Spark-group, which grows by up to
    2^(r - bits) — at extreme corpus sizes raise ``supergroup_bits`` toward
    ``r`` to keep per-task group materialization bounded.

    ``multiprobe_flips`` lifts recall without more tables (the same trick
    that took the top-k side's recall@10 0.755 -> 0.949): the probe side is
    the probe-expanded keying (home bucket plus flipped-margin buckets) —
    pair (a, b) is found when EITHER side's probe set reaches the other's
    home bucket, and the candidate canonicalization (min/max + distinct)
    removes the double-count. Probe rows aimed at a capped bucket match
    nothing — the cap stays a home-side property.

    Dense, non-null vectors are assumed (a null vector or null element
    could never produce an output pair anyway — its cosine is NULL).
    """
    # r7 restructuring, measured at sf1.0 (20k x 64-dim; 86.5 s -> ~4 s)
    # and exact-checked against the DuckDB oracle:
    #
    # 1. ONE keying pass, persisted. The r6 plan referenced the keyed frame
    #    three times (bucket-size aggregate, capped home side, probe side),
    #    and Catalyst duplicated the whole 4-branch union under each — 12
    #    per-table plane-dot projections of r*dim unrolled terms, each its
    #    own WholeStageCodegen compile (~370 KB formatted plan; Janino fixed
    #    cost was the headline suite's biggest line item, VERDICT r6 #2).
    #    Computing the per-table keys AND probe key-sets in one projection
    #    and persisting that frame leaves exactly n_tables big compiles
    #    (guide §2.4: share one pass; §3.3: materialize to truncate a
    #    duplicated plan). The persisted frame is |emb| x L rows of
    #    (vid, v, sn, key[, pkeys]) — MEMORY_AND_DISK, spills gracefully.
    # 2. sqrt(norm2(v)) is computed ONCE PER KEYED ROW (column ``_sn``), not
    #    once per candidate pair — a per-vector quantity the r6 inline
    #    ``cosine`` re-folded for every one of the ~O(n^2/2^r) candidates.
    # 3. The candidate stage is a COGROUP by (table_id, key), scored as a
    #    per-bucket dot MATRIX in numpy (guide §4.2: let Spark do the
    #    shuffle, hand whole batches to vectorized native code). Vectors
    #    cross the Arrow boundary once per KEYED row (|emb| x L x (1+flips)
    #    rows) — never per candidate pair. The three alternatives all
    #    measured worse at sf1.0 (14.5M candidates): inline JVM HOF cosine
    #    25.5 s (interpreted per-element fold), fully unrolled codegen dot
    #    154 s, mapInArrow over the join output 17 s (the JVM serializes
    #    ~0.5 KB of vector copies per PAIR into Arrow). The cogroup: 3.7 s.
    #    The numpy accumulation is an explicit left-to-right column loop in
    #    float64 — the exact IEEE evaluation order of the HOF fold — so
    #    cos_sim doubles are bit-identical (oracle-hash-pinned).
    #    The per-group matrix is chunked to <=64 MB; the home side of a
    #    group is bounded by ``max_bucket_size`` (the cap is now a
    #    len(home)-check inside the group — identical semantics to the r6
    #    broadcast anti-join, one less pass over the keyed frame). Residual
    #    skew surface: a pathological probe inflow into one bucket
    #    materializes as one pandas group (AQE cannot split a cogroup the
    #    way it splits a join); expected inflow is |emb|*L*(1+flips)/2^r
    #    rows per bucket, and the matrix work is capped by the home side.
    r = planes_per_table
    branches = []
    for t in range(n_tables):
        dots_sql = "array(" + ", ".join(
            _dot_lit_sql(f"`{vec_col}`", _hyperplane(dim, t * r + p))
            for p in range(r)
        ) + ")"
        d = emb.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            F.sqrt(_norm2(F.col(vec_col))).alias("_sn"),
            F.expr(dots_sql).alias("_dots"),
        )
        key_sql = "CAST((" + " + ".join(
            f"(CASE WHEN _dots[{p}] >= 0D THEN {1 << p} ELSE 0 END)"
            for p in range(r)
        ) + ") AS INT)"
        if multiprobe_flips:
            flips_sql = (
                f"slice(array_sort(transform(sequence(0, {r - 1}), "
                f"p -> named_struct('m', abs(_dots[p]), 'p', p))), "
                f"1, {multiprobe_flips})"
            )
            k = d.select(
                "vid", "v", "_sn",
                F.lit(t).alias("table_id"),
                F.expr(key_sql).alias("key"),
                F.expr(flips_sql).alias("_flip"),
            ).select(
                "vid", "v", "_sn", "table_id", "key",
                F.expr(
                    "array_union(array(key), "
                    "transform(_flip, s -> CAST(key ^ shiftleft(1, s.p) AS INT)))"
                ).alias("_pkeys"),
            )
        else:
            k = d.select(
                "vid", "v", "_sn",
                F.lit(t).alias("table_id"),
                F.expr(key_sql).alias("key"),
            )
        branches.append(k)
    keyed = branches[0]
    for b in branches[1:]:
        keyed = keyed.unionByName(b)
    # Eager fill: the cogroup's TWO grouped sides reference this frame from
    # concurrent shuffle-map stages — against a cold cache both stages
    # compute the full keying union (measured at the 10^6 x r=16 cell: the
    # plane-dot keying ran twice, ~+90 s). One cheap count materializes the
    # cache exactly once before either side reads it (the same eager-
    # materialization precedent as ops/cluster.py's localCheckpoint).
    keyed = keyed.persist()
    keyed.count()
    home = keyed.select("vid", "v", "_sn", "table_id", "key")
    id_t = emb.schema[id_col].dataType.simpleString()
    out_schema = f"vec_a {id_t}, vec_b {id_t}, cos_sim double"
    shift = max(0, r - max(0, supergroup_bits))
    skey = F.shiftright(F.col("key"), shift).alias("_skey")
    if multiprobe_flips:
        probe = keyed.select(
            "vid", "v", "_sn", "table_id", F.explode("_pkeys").alias("key")
        )
        scored = (
            probe.select("*", skey).groupBy("table_id", "_skey")
            .cogroup(home.select("*", skey).groupBy("table_id", "_skey"))
            .applyInPandas(
                _bucket_pair_scorer(float(threshold), max_bucket_size),
                schema=out_schema,
            )
        )
    else:
        scored = (
            home.select("*", skey).groupBy("table_id", "_skey")
            .applyInPandas(
                _bucket_self_scorer(float(threshold), max_bucket_size),
                schema=out_schema,
            )
        )
    return scored.dropDuplicates(["vec_a", "vec_b", "cos_sim"])
