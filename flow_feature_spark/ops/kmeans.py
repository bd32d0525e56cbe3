"""Deterministic quantized k-means: IVF anchor training as a Spark job.

Lloyd's algorithm made CROSS-ENGINE EXACT — the thing float k-means can
never be, because centroid means are order-dependent float sums. Every
quantity lives in an exact domain:

* embeddings quantize once to int64 (``floor(x·2^20 + 0.5)``, the same
  IEEE ops in numpy and SQL);
* distances are integer sums of squares (≤ 64·2^42, overflow-free in
  int64), ties broken to the smallest centroid index;
* centroid updates are integer sums (order-independent) divided with ONE
  pinned double-op sequence ``floor((2.0·s + n) / (2.0·n))`` — round-half-up
  of the exact mean, identical in Python, numpy and SQL;
* initialization is content-addressed: the k vectors with the smallest
  ``(md5(id), id)`` — no RNG, no partition-order dependence.

So two runs at any parallelism — or the same T iterations replayed in
DuckDB — produce bit-identical centroids, and the driver's hash gate can
grade an ITERATIVE algorithm exactly (driver query ``kmeans_centroids``).

Shape at scale (10^9 vectors): per iteration, ONE ``mapInPandas`` pass
fuses quantization + assignment (numpy argmin against the k×dim broadcast
centroid matrix) + per-batch partial sums, emitting k rows per batch —
the shuffle carries k·dim·batches skinny rows, never the points; the
driver folds k×dim integers. Same job shape as Spark MLlib's KMeans
(per-iteration broadcast + tree-aggregate), with exactness on top.

Reference basis: the reference has no clustering (its flows are exact
5-tuple groups, flow.py:98-127); this trains the IVF anchor table
``ops/similarity.ivf_topk`` probes, replacing its md5-derived anchors
with data-adapted ones.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_BITS = 20
_SCALE = float(1 << SCALE_BITS)


def _quantize_np(mat):
    import numpy as np

    return np.floor(mat.astype(np.float64) * _SCALE + 0.5).astype(np.int64)


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[int]]:
    """The k quantized vectors with the smallest (md5(id), id) — a global
    TakeOrdered, one pass, no RNG."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the {len(rows)} available vectors")
    import numpy as np

    return [
        _quantize_np(np.asarray(r["v"], dtype=np.float64)).tolist()
        for r in rows
    ]


def _argmin_cells(q, cmat):
    """Nearest centroid per row, EXACT integer arithmetic via the matmul
    identity: argmin_j |q−c_j|² = argmin_j (−2 q·c_j + |c_j|²) — the |q|²
    term is constant per row, dropping it changes no comparison. All terms
    ≤ 2^47, overflow-free in int64, and int64 matmul beats the (n,k,dim)
    difference-tensor expansion by ~50× in memory traffic (the expansion
    thrashed the allocator so badly that 32 workers ran SLOWER than 8).
    argmin returns the first minimum = smallest centroid index, the tie
    rule the SQL oracle's (dist, c) ordering encodes."""
    import numpy as np

    score = (-2 * (q @ cmat.T)) + (cmat * cmat).sum(axis=1)[None, :]
    return score.argmin(axis=1)


def _assign_and_partial_sums(centroids: list[list[int]], vec_col: str):
    """mapInPandas worker: quantize the batch, argmin over the broadcast
    centroid matrix (ties -> smallest index), emit per-cluster partial
    sums — k skinny rows per batch, never the points."""
    import numpy as np
    import pandas as pd

    cmat = np.asarray(centroids, dtype=np.int64)  # k x dim

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            q = _quantize_np(np.stack(pdf[vec_col].to_numpy()))  # n x dim
            assign = _argmin_cells(q, cmat)
            out = []
            for c in np.unique(assign):
                sel = q[assign == c]
                out.append(
                    {
                        "cluster": int(c),
                        "n": int(sel.shape[0]),
                        "s": sel.sum(axis=0, dtype=np.int64).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return fn


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Run ``iters`` Lloyd iterations; returns the final k×dim int64
    centroid matrix (quantized domain). Early-stops when an iteration
    moves no centroid — a driver-side integer comparison, no extra job.
    Empty clusters keep their previous centroid (no respawn: respawning
    would need an order-dependent pick)."""
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    cents = seed_centroids(df, k, id_col=id_col, vec_col=vec_col)
    dim = len(cents[0])
    pts = df.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        part = pts.mapInPandas(
            _assign_and_partial_sums(cents, "v"),
            schema="cluster int, n long, s array<long>",
        )
        agg = (
            part.select("cluster", "n", F.posexplode("s").alias("pos", "sv"))
            .groupBy("cluster", "pos")
            .agg(F.sum("sv").alias("s"), F.sum("n").alias("cnt"))
            .collect()
        )
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in agg:
            sums.setdefault(r["cluster"], [0] * dim)[r["pos"]] = int(r["s"])
            # each (cluster, pos) group folds one n per batch: cnt is the
            # cluster's total point count, identical across pos
            counts[r["cluster"]] = int(r["cnt"])
        new_cents = []
        for c in range(k):
            if c not in counts or counts[c] == 0:
                new_cents.append(list(cents[c]))
                continue
            n = counts[c]
            new_cents.append(
                [
                    int(math.floor((2.0 * float(s) + float(n)) / (2.0 * float(n))))
                    for s in sums[c]
                ]
            )
        if new_cents == cents:
            break
        cents = new_cents
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) for every vector under the given quantized centroids —
    the IVF routing step. Same integer distance + smallest-index tie rule
    as training."""
    import numpy as np
    import pandas as pd

    cmat = np.asarray(centroids, dtype=np.int64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            q = _quantize_np(np.stack(pdf["__v"].to_numpy()))
            assign = _argmin_cells(q, cmat)
            yield pd.DataFrame(
                {"id": pdf["__id"], "cluster": assign.astype("int32")}
            )

    out = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(fn, schema=f"id {df.schema[id_col].dataType.simpleString()}, cluster int")
    return out.withColumnsRenamed({"id": id_col})


def dequantize(centroids: list[list[int]]) -> list[list[float]]:
    """Quantized centroids back to float anchors — the shape
    ``ops/similarity.ivf_topk(anchors=...)`` consumes, replacing its
    data-independent md5 hyperplanes with trained cells."""
    return [[c / _SCALE for c in vec] for vec in centroids]


def centroids_frame(spark, centroids: list[list[int]]) -> DataFrame:
    """The centroid matrix as a (cluster, pos, cq) frame — the shape the
    driver gate hashes."""
    rows = [
        (c, p, int(v))
        for c, vec in enumerate(centroids)
        for p, v in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "cluster int, pos int, cq bigint")
