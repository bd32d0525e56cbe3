"""Isolate embedding_near_dup cost components at a given sf dir (guide §1.4).

Times, with a noop sink and best-of-N in one JVM:
  keyed     — the persisted keying pass alone (4-table keys + probe sets + norms)
  pairs     — candidate join, counting pairs only (no cosine)
  dot       — candidate join + HOF dot (no threshold/distinct)
  full      — the declared query (.count(), the frozen bench methodology)

Usage: python tools/bench_neardup_isolate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

from harness import tool_spark

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.2f}s")
    return best


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    import __spark_entry__ as e
    from flow_feature_spark.ops import similarity as sim

    spark = tool_spark("neardup_isolate", cpus=32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim, n_tables, r, flips, cap = 64, 4, 8, 1, 10_000

    # rebuild the keyed frame exactly as the operator does (no persist here —
    # we time one materialization)
    def build_keyed():
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
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    timed("keyed (noop, unpersisted)", lambda: noop(build_keyed()), n=2)

    def joined(select_cos: bool):
        keyed = build_keyed().persist()
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
        if select_cos:
            out = j.select(
                sim._r6(
                    sim._dot(F.col("a.v"), F.col("b.v"))
                    / (F.col("a._sn") * F.col("b._sn"))
                ).alias("cos_sim")
            )
        else:
            out = j.select(F.col("a.vid"))
        n = out.count()
        keyed.unpersist()
        return n

    n_pairs = None

    def pairs_only():
        nonlocal n_pairs
        n_pairs = joined(False)

    timed("pairs only (count, no cosine)", pairs_only, n=2)
    print(f"  candidate pairs: {n_pairs}")
    timed("pairs + HOF dot cosine (count)", lambda: joined(True), n=2)

    qmap = e.queries()
    timed("full declared query (.count)", lambda: qmap["embedding_near_dup"](spark, sf_dir).count(), n=2)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
