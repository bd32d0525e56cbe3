"""Compare per-pair dot formulations inside the near-dup candidate filter.

The cosine cannot be pruned here (the threshold filter consumes it), so this
times the real per-pair arithmetic: HOF fold vs fully unrolled 64-term
codegen vs unrolled-via-SQL-text. All three sum left-to-right from 0.0 in
index order -> bit-identical doubles (asserted: identical surviving counts).

Usage: python tools/bench_neardup_dotform.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from harness import tool_spark

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    from flow_feature_spark.ops import similarity as sim

    spark = tool_spark("neardup_dotform", cpus=32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim, n_tables, r, flips, cap, threshold = 64, 4, 8, 1, 10_000, 0.35

    def scored(dot_form: str):
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
        keyed = keyed.persist()
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
        av, bv = F.col("a.v"), F.col("b.v")
        if dot_form == "hof":
            dot = sim._dot(av, bv)
        elif dot_form == "unrolled":
            dot = sim._dot(av, bv, dim)
        elif dot_form == "sqltext":
            terms = "".join(
                f" + (CAST(a.v[{j_}] AS DOUBLE) * CAST(b.v[{j_}] AS DOUBLE))"
                for j_ in range(dim)
            )
            dot = F.expr("(0.0D" + terms + ")")
        else:
            raise ValueError(dot_form)
        out = (
            j.select(
                F.least(F.col("a.vid"), F.col("b.vid")).alias("vec_a"),
                F.greatest(F.col("a.vid"), F.col("b.vid")).alias("vec_b"),
                sim._r6(dot / (F.col("a._sn") * F.col("b._sn"))).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
            .dropDuplicates(["vec_a", "vec_b", "cos_sim"])
        )
        n = out.count()
        keyed.unpersist()
        return n

    for form in ("hof", "unrolled", "sqltext", "hof"):
        best, n = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            n = scored(form)
            best = min(best, time.time() - t0)
        print(f"{form}: {best:.2f}s  surviving_pairs={n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
