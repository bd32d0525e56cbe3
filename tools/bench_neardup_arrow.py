"""Near-dup candidate scoring: JVM HOF fold vs Arrow/numpy column loop.

The numpy variant computes dot and norms with an explicit left-to-right
column accumulation (acc = acc + a[:,j]*b[:,j] over j) in float64 — the
exact IEEE evaluation order of the HOF fold — so cos_sim doubles are
bit-identical; asserted by comparing the surviving pair sets' checksums.

Usage: python tools/bench_neardup_arrow.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

from harness import tool_spark

from pyspark.sql import functions as F


def build(emb, sim, dim, n_tables, r, flips):
    branches = []
    for t in range(n_tables):
        dots_sql = "array(" + ", ".join(
            sim._dot_lit_sql("`embedding`", sim._hyperplane(dim, t * r + p))
            for p in range(r)
        ) + ")"
        d = emb.select(
            F.col("vec_id").alias("vid"),
            F.col("embedding").alias("v"),
            F.sqrt(sim._norm2(F.col("embedding"))).alias("_sn"),
            F.expr(dots_sql).alias("_dots"),
        )
        key_sql = "CAST((" + " + ".join(
            f"(CASE WHEN _dots[{p}] >= 0D THEN {1 << p} ELSE 0 END)"
            for p in range(r)
        ) + ") AS INT)"
        flips_sql = (
            f"slice(array_sort(transform(sequence(0, {r - 1}), "
            f"p -> named_struct('m', abs(_dots[p]), 'p', p))), 1, {flips})"
        )
        k = d.select(
            "vid", "v", "_sn", F.lit(t).alias("table_id"),
            F.expr(key_sql).alias("key"), F.expr(flips_sql).alias("_flip"),
        ).select(
            "vid", "v", "_sn", "table_id", "key",
            F.expr(
                "array_union(array(key), "
                "transform(_flip, s -> CAST(key ^ shiftleft(1, s.p) AS INT)))"
            ).alias("_pkeys"),
        )
        branches.append(k)
    keyed = branches[0]
    for b in branches[1:]:
        keyed = keyed.unionByName(b)
    return keyed


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    from flow_feature_spark.ops import similarity as sim

    spark = tool_spark("neardup_arrow", cpus=32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim, n_tables, r, flips, cap, threshold = 64, 4, 8, 1, 10_000, 0.35

    def run(form: str):
        keyed = build(emb, sim, dim, n_tables, r, flips).persist()
        home = keyed.select("vid", "v", "_sn", "table_id", "key")
        big = (
            home.groupBy("table_id", "key")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > cap)
            .select("table_id", "key")
        )
        capped = home.join(F.broadcast(big), ["table_id", "key"], "left_anti")
        probe = keyed.select(
            "vid", "v", "_sn", "table_id", F.explode("_pkeys").alias("key")
        )
        a, b = probe.alias("a"), capped.alias("b")
        j = a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        if form == "hof":
            scored = j.select(
                F.least(F.col("a.vid"), F.col("b.vid")).alias("vec_a"),
                F.greatest(F.col("a.vid"), F.col("b.vid")).alias("vec_b"),
                sim._r6(
                    sim._dot(F.col("a.v"), F.col("b.v"))
                    / (F.col("a._sn") * F.col("b._sn"))
                ).alias("cos_sim"),
            ).filter(F.col("cos_sim") >= threshold)
        else:
            cand = j.select(
                F.col("a.vid").alias("_va"), F.col("b.vid").alias("_vb"),
                F.col("a.v").alias("_xa"), F.col("b.v").alias("_xb"),
                (F.col("a._sn") * F.col("b._sn")).alias("_den"),
            )
            th = float(threshold)

            def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    n = len(pdf)
                    if n == 0:
                        continue
                    xa = np.asarray(
                        np.stack(pdf["_xa"].to_numpy()), dtype=np.float64
                    )
                    xb = np.asarray(
                        np.stack(pdf["_xb"].to_numpy()), dtype=np.float64
                    )
                    acc = np.zeros(n, dtype=np.float64)
                    for col in range(xa.shape[1]):
                        acc = acc + xa[:, col] * xb[:, col]
                    cos = np.floor(
                        (acc / pdf["_den"].to_numpy()) * 1e6 + 0.5
                    ) / 1e6
                    keep = cos >= th
                    va = pdf["_va"].to_numpy()[keep]
                    vb = pdf["_vb"].to_numpy()[keep]
                    yield pd.DataFrame({
                        "vec_a": np.minimum(va, vb),
                        "vec_b": np.maximum(va, vb),
                        "cos_sim": cos[keep],
                    })

            if form == "arrow2":
                import pyarrow as pa

                def score_rb(batches):
                    for rb in batches:
                        n = rb.num_rows
                        if n == 0:
                            continue
                        xa = rb.column(2).flatten().to_numpy(
                            zero_copy_only=False
                        ).reshape(n, -1).astype(np.float64)
                        xb = rb.column(3).flatten().to_numpy(
                            zero_copy_only=False
                        ).reshape(n, -1).astype(np.float64)
                        den = rb.column(4).to_numpy(zero_copy_only=False)
                        acc = np.zeros(n, dtype=np.float64)
                        for col in range(xa.shape[1]):
                            acc = acc + xa[:, col] * xb[:, col]
                        cos = np.floor((acc / den) * 1e6 + 0.5) / 1e6
                        keep = cos >= th
                        va = rb.column(0).to_numpy(zero_copy_only=False)[keep]
                        vb = rb.column(1).to_numpy(zero_copy_only=False)[keep]
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(np.minimum(va, vb), type=pa.int64()),
                                pa.array(np.maximum(va, vb), type=pa.int64()),
                                pa.array(cos[keep], type=pa.float64()),
                            ],
                            names=["vec_a", "vec_b", "cos_sim"],
                        )

                scored = cand.mapInArrow(
                    score_rb, schema="vec_a bigint, vec_b bigint, cos_sim double"
                )
            else:
                scored = cand.mapInPandas(
                    score, schema="vec_a bigint, vec_b bigint, cos_sim double"
                )
        out = scored.dropDuplicates(["vec_a", "vec_b", "cos_sim"])
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("vec_a") * 7 + F.col("vec_b")).alias("chk"),
            F.sum(F.col("cos_sim")).alias("csum"),
        ).collect()[0]
        keyed.unpersist()
        return agg["n"], agg["chk"], float(agg["csum"])

    for form in ("arrow2", "arrow2"):
        best, res = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            res = run(form)
            best = min(best, time.time() - t0)
        print(f"{form}: {best:.2f}s  n={res[0]} chk={res[1]} csum={res[2]!r}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
