"""Deterministic quantized k-means (ops/kmeans.py), brute-force-pinned.

The property that makes the operator: bit-identical centroids at any
parallelism and vs a pure-Python Lloyd replica — integer domains remove
the float-sum order dependence that makes ordinary k-means unreproducible.
"""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from flow_feature_spark.ops.kmeans import (
    centroids_frame,
    kmeans_assign,
    kmeans_fit,
    seed_centroids,
)


def _py_quant(v):
    return [int(math.floor(float(x) * (1 << 20) + 0.5)) for x in v]


def _py_kmeans(rows, k, iters):
    """Pure-Python Lloyd replica of the contract."""
    pts = {i: _py_quant(v) for i, v in rows}
    seeds = sorted(pts, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = [list(pts[i]) for i in seeds]
    dim = len(cents[0])
    assign = {}
    for _ in range(iters):
        sums = [[0] * dim for _ in range(k)]
        counts = [0] * k
        for i, q in pts.items():
            d = [sum((a - b) ** 2 for a, b in zip(q, c)) for c in cents]
            c = d.index(min(d))  # first min = smallest index
            assign[i] = c
            counts[c] += 1
            for p in range(dim):
                sums[c][p] += q[p]
        new = []
        for c in range(k):
            if counts[c] == 0:
                new.append(list(cents[c]))
            else:
                n = counts[c]
                new.append(
                    [
                        int(math.floor((2.0 * float(s) + float(n)) / (2.0 * float(n))))
                        for s in sums[c]
                    ]
                )
        if new == cents:
            break
        cents = new
    return cents, assign


def _rand_rows(n=60, dim=8, seed=5):
    rng = random.Random(seed)
    return [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_matches_python_replica_and_parallelism_invariant(spark):
    rows = _rand_rows()
    # float32 storage rounds the values: replicate through the same dtype
    import numpy as np

    rows32 = [(i, np.asarray(v, dtype=np.float32).tolist()) for i, v in rows]
    exp_cents, exp_assign = _py_kmeans(rows32, k=4, iters=3)

    df = _df(spark, rows)
    got1 = kmeans_fit(df.repartition(1), k=4, iters=3)
    got8 = kmeans_fit(df.repartition(8), k=4, iters=3)
    assert got1 == exp_cents
    assert got8 == exp_cents  # exact at ANY parallelism

    got_assign = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, got1).collect()
    }
    assert got_assign == exp_assign


def test_empty_cluster_keeps_seed_and_early_stop(spark):
    # three identical points, k=2: everything lands on the first seed's
    # cluster, the other keeps its (identical) seed centroid; iteration 2
    # is a fixed point so early-stop triggers — result equals iters=10
    df = _df(spark, [(i, [0.5, -0.25]) for i in range(3)])
    c2 = kmeans_fit(df, k=2, iters=2)
    c10 = kmeans_fit(df, k=2, iters=10)
    assert c2 == c10
    q = _py_quant([0.5, -0.25])
    assert c2 == [q, q]


def test_seed_centroids_content_addressed(spark):
    rows = _rand_rows(n=10)
    df = _df(spark, rows)
    seeds = seed_centroids(df, k=3)
    order = sorted(
        range(10), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:3]
    import numpy as np

    exp = [
        _py_quant(np.asarray(dict(rows)[i], dtype=np.float32).tolist())
        for i in order
    ]
    assert seeds == exp
    with pytest.raises(ValueError, match="exceeds"):
        seed_centroids(df, k=11)


def test_centroids_frame_shape(spark):
    cents = [[1, -2], [3, 4]]
    out = centroids_frame(spark, cents).collect()
    assert sorted(map(tuple, out)) == [(0, 0, 1), (0, 1, -2), (1, 0, 3), (1, 1, 4)]


def test_trained_anchors_drive_ivf(spark):
    """kmeans centroids plug into ivf_topk as anchors: explicit default
    anchors reproduce the default call exactly (wiring), and trained
    anchors yield a well-formed top-k with BETTER-or-equal cell balance."""
    from flow_feature_spark.ops.kmeans import dequantize
    from flow_feature_spark.ops.similarity import _ivf_anchor, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = 64
    default = ivf_topk(emb, dim, n_queries=4, k=3, n_anchors=8, nprobe=3)
    explicit = ivf_topk(
        emb, dim, n_queries=4, k=3, n_anchors=8, nprobe=3,
        anchors=[_ivf_anchor(dim, a) for a in range(8)],
    )
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, explicit.collect())
    )

    trained = dequantize(kmeans_fit(emb, k=8, iters=2))
    out = ivf_topk(
        emb, dim, n_queries=4, k=3, nprobe=3, anchors=trained
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q

    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim"):
        ivf_topk(emb, dim, anchors=[[0.0] * 3])
