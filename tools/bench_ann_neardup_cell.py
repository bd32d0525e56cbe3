"""One near-dup cell of bench_ann_scale.py in its OWN JVM.

The full chain accumulates /dev/shm shuffle + driver heap across ~10 jobs;
the flips=4 cell at 10^6 vectors OOM-killed the shared session. Per the
bench discipline (own JVM per cell), this runner reuses the corpus parquet
written by bench_ann_scale.py, recomputes the construction truth (cheap
base_key self-join), runs exactly one embedding_near_dup_pairs cell, and
prints the same JSON cell dict.

Usage: python tools/bench_ann_neardup_cell.py <flips> [corpus_dir]
"""

from __future__ import annotations

import json
import sys
import time

from harness import max_task_rows, tool_spark


def main() -> int:
    flips = int(sys.argv[1])
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ffs_ann_scale/embeddings"

    from pyspark.sql import functions as F

    from flow_feature_spark.ops import similarity as sim

    spark = tool_spark(
        "ann_neardup_cell", cpus=32, shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    src = spark.read.parquet(path)
    emb = src.select("vec_id", "embedding")

    ga = src.select("base_key", F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    gb = src.select("base_key", F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    truth = (
        ga.join(gb, "base_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", sim.cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= 0.9)
        .select("a", "b")
    )
    truth_pairs = {(r["a"], r["b"]) for r in truth.collect()}

    t0 = time.time()
    nd = sim.embedding_near_dup_pairs(
        emb, dim=64, threshold=0.9, n_tables=4, planes_per_table=16,
        max_bucket_size=10_000, multiprobe_flips=flips,
    ).persist()
    n_found = nd.count()
    wall = round(time.time() - t0, 1)
    mtr, n_tasks = max_task_rows(nd)
    found = {(r_["vec_a"], r_["vec_b"]) for r_ in nd.collect()}
    nd.unpersist()
    hit = len(found & truth_pairs)
    cell = {
        "flips": flips,
        "wall_s": wall,
        "found_pairs": n_found,
        "true_pairs": len(truth_pairs),
        "recall": round(hit / max(len(truth_pairs), 1), 3),
        "beyond_construction": len(found - truth_pairs),
        "max_task_rows": mtr,
        "n_tasks": n_tasks,
    }
    print("CELL " + json.dumps(cell))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
