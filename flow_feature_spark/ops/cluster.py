"""Connected components over near-duplicate pair graphs (dedup clustering).

The dedup operators (ops/dedup.py, ops/similarity.py) emit PAIRS; a corpus
pipeline must then group pairs into duplicate CLUSTERS and keep one canonical
document per cluster. That grouping is connected components, which Spark has
no built-in for.

Implementation: iterative minimum-label propagation with pointer jumping on
DataFrames — every node starts labeled with itself; each round, a node's
label drops to the minimum label in its closed neighborhood (one equi join +
one hash aggregate), then shortcuts to its label's own label (one more
self-join). The jump is what makes the round count O(log diameter) instead
of O(diameter) — the same doubling idea as the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) and classic PRAM pointer jumping; the 30-node-chain unit test pins
the worst-diameter regime. Near-duplicate graphs are shallow-diameter
anyway (LSH bands emit quasi-cliques), so typical corpora converge in 2-4
rounds. No driver-side graph state: the loop reads one O(1) convergence
scalar per round (a limit(1).count(), not a collect of rows), and
localCheckpoint truncates lineage so the self-referencing plan cannot grow
geometrically across rounds.

The component id is the minimum node id of the component — deterministic,
cross-engine (the DuckDB oracle computes it as min over the recursive
transitive closure), and directly usable as the canonical-document choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable. Undirected: edges are symmetrized internally.
    Raises if ``max_iter`` rounds do not converge (diameter > max_iter —
    switch to a larger budget; never silently returns half-merged labels).

    ``checkpoint_every``: truncate the iterative plan lineage periodically
    (localCheckpoint) so the loop does not build an O(rounds)-deep plan.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("a"), F.col(dst_col).cast("long").alias("b")
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).filter(
        F.col("a") != F.col("b")
    ).distinct()
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    sym = sym.persist()
    sym.count()

    for it in range(max_iter):
        # candidate labels flowing along edges: neighbor's current label
        flowed = (
            sym.join(labels.withColumnRenamed("node", "a"), on="a")
            .select(F.col("b").alias("node"), "label")
        )
        stepped = (
            labels.unionByName(flowed)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: shortcut to the label's own label (labels are node
        # ids, monotonically non-increasing, so label[label] is defined and
        # <= label) — turns O(diameter) rounds into O(log diameter)
        parents = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("plabel")
        )
        new_labels = stepped.join(parents, on="label", how="left").select(
            "node",
            F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        # convergence: any node whose label still shrinks this round?
        changed = (
            labels.withColumnRenamed("label", "old")
            .join(new_labels, on="node")
            .filter(F.col("label") < F.col("old"))
            .limit(1)
            .count()
        )
        old = labels
        labels = new_labels
        if old is not sym:
            old.unpersist()
        if changed == 0:
            sym.unpersist()
            return labels.select("node", F.col("label").alias("component"))
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter exceeds the budget); raise max_iter"
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs -> (doc_id, component, is_canonical): the dedup
    decision table. Keep rows with is_canonical; drop the rest. Docs with no
    pair partner are not listed (they are trivially canonical)."""
    cc = connected_components(pairs, src_col=a_col, dst_col=b_col)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
