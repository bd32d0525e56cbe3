"""Scale smoke for connected_components: millions of edges, skewed shapes.

Graph = 200k disjoint 10-node chains (1.8M edges, diameter 9 — the
pointer-jumping regime) + one 100k-leaf star (hub skew: one label floods
100k nodes) + bridges chaining every 1000th chain to the star (one
300k-node mega-component). Verifies component counts exactly (they are
computable in closed form), then reports wall-clock at local[32].

Results -> BENCH/CLUSTER_SMOKE.md. Run on an otherwise-idle machine.
"""

from __future__ import annotations

import os
import time

from harness import BENCH_DIR, tool_spark

N_CHAINS = 200_000
CHAIN = 10
STAR_LEAVES = 100_000
BRIDGE_EVERY = 1000


def main() -> int:
    from pyspark.sql import functions as F

    from flow_feature_spark.ops.cluster import connected_components

    spark = tool_spark("cc_smoke", cpus=32, shuffle_partitions=64)

    n_chain_nodes = N_CHAINS * CHAIN
    chains = spark.range(n_chain_nodes).filter(
        F.col("id") % CHAIN != CHAIN - 1
    ).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    hub = F.lit(n_chain_nodes)
    star = spark.range(STAR_LEAVES).select(
        hub.alias("src"), (F.col("id") + n_chain_nodes + 1).alias("dst")
    )
    # bridge chain k*BRIDGE_EVERY's head to the hub -> one mega-component
    bridges = spark.range(N_CHAINS // BRIDGE_EVERY).select(
        (F.col("id") * BRIDGE_EVERY * CHAIN).alias("src"), hub.alias("dst")
    )
    edges = chains.unionByName(star).unionByName(bridges)
    n_edges = edges.count()

    t0 = time.time()
    cc = connected_components(edges, max_iter=30)
    comps = cc.groupBy("component").count()
    n_nodes = cc.count()
    n_comps = comps.count()
    mega = comps.agg(F.max("count")).collect()[0][0]
    wall = time.time() - t0

    exp_nodes = n_chain_nodes + STAR_LEAVES + 1
    exp_mega = STAR_LEAVES + 1 + (N_CHAINS // BRIDGE_EVERY) * CHAIN
    exp_comps = N_CHAINS - N_CHAINS // BRIDGE_EVERY + 1
    ok = (n_nodes, n_comps, mega) == (exp_nodes, exp_comps, exp_mega)

    out = "\n".join([
        "# connected_components scale smoke",
        "",
        "`tools/bench_cluster.py`, local[32]: 200k 10-node chains + 100k-leaf",
        "star hub + bridges merging every 1000th chain into one mega-component.",
        "",
        f"- edges: {n_edges:,}; nodes: {n_nodes:,}",
        f"- components: {n_comps:,} (expected {exp_comps:,}); "
        f"largest: {mega:,} (expected {exp_mega:,})",
        f"- exact-structure check: {'PASS' if ok else 'FAIL'}",
        f"- wall-clock incl. verification aggregates: {wall:.1f} s "
        f"({n_edges / wall:,.0f} edges/s)",
        "",
        "Diameter-9 chains + a 100k-degree hub in the same run: pointer",
        "jumping keeps the round count logarithmic and the hub's label flood",
        "is one hash-aggregate — no per-component task, no driver-side graph.",
    ]) + "\n"
    # full rewrite on purpose: this smoke is a single-snapshot artifact
    with open(os.path.join(BENCH_DIR, "CLUSTER_SMOKE.md"), "w") as f:
        f.write(out)
    print(out)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
