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
rounds. No driver-side graph state, and ONE Spark job per round: the old
label is threaded through the label step as a carried column, so the
convergence count is a filter over the frame the round materializes anyway —
no separate join-and-count job. localCheckpoint truncates lineage so the
self-referencing plan cannot grow geometrically across rounds.

Node ids may be integral (used directly) or strings (document hashes, URLs —
dictionary-encoded to dense longs internally and decoded on the way out;
components then labeled by the MINIMUM ORIGINAL id, so the result is
deterministic even though the internal encoding is not). Any other id type
raises — silently NULLing ids under cast('long') would drop every edge and
turn dedup into a no-op.

The component id is the minimum node id of the component — deterministic,
cross-engine (the DuckDB oracle computes it as min over the recursive
transitive closure), and directly usable as the canonical-document choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _propagate_long(sym: DataFrame, max_iter: int, checkpoint_every: int) -> DataFrame:
    """Min-label propagation + pointer jumping over symmetrized long-id
    edges. Returns (node, label). ONE job per round: the convergence count is
    computed from the persisted new-labels frame in the same action that
    fills its cache (the old label rides along as a column, so no
    labels-vs-new-labels join is needed)."""
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    sym = sym.persist()
    sym.count()
    prev_holder = None  # the persisted frame backing the current `labels`

    for it in range(max_iter):
        # candidate labels flowing along edges: neighbor's current label.
        # Thread each node's OLD label through the union (null on flowed
        # rows; max() recovers the unique non-null per node) so convergence
        # is decidable from this round's output alone.
        flowed = (
            sym.join(labels.withColumnRenamed("node", "a"), on="a")
            .select(
                F.col("b").alias("node"),
                "label",
                F.lit(None).cast("long").alias("old"),
            )
        )
        stepped = (
            labels.select("node", "label", F.col("label").alias("old"))
            .unionByName(flowed)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
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
            "old",
        ).persist()
        # convergence check = the round's ONLY job: the count scans every
        # partition of the persisted frame, filling the cache as it goes
        changed = new_labels.filter(F.col("label") < F.col("old")).count()
        next_labels = new_labels.select("node", "label")
        if (it + 1) % checkpoint_every == 0:
            # lineage truncation reads from the just-filled cache — a cheap
            # copy job, not a recompute of the round
            next_labels = next_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            holder = None  # checkpoint blocks are their own storage
        else:
            holder = new_labels
        if prev_holder is not None:
            prev_holder.unpersist()
        prev_holder = holder
        labels = next_labels
        if changed == 0:
            sym.unpersist()
            if prev_holder is not None:
                # the converged labels are still backed by this round's
                # persisted frame — materialize them into their own storage
                # (localCheckpoint) and release the cache, so no caller-held
                # reference keeps a session-lifetime cached frame alive
                labels = labels.localCheckpoint(eager=True)
                prev_holder.unpersist()
            return labels
    sym.unpersist()
    if prev_holder is not None:
        prev_holder.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter exceeds the budget); raise max_iter"
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable (numeric min for integral ids, lexicographic min
    for string ids). Undirected: edges are symmetrized internally. Raises if
    ``max_iter`` rounds do not converge (diameter > max_iter — switch to a
    larger budget; never silently returns half-merged labels), and raises on
    non-integral non-string id columns (a blind cast('long') would NULL
    string ids and silently drop every edge).

    ``checkpoint_every``: truncate the iterative plan lineage periodically
    (localCheckpoint) so the loop does not build an O(rounds)-deep plan.
    """
    src_dt = edges.schema[src_col].dataType
    dst_dt = edges.schema[dst_col].dataType
    integral = isinstance(src_dt, _INTEGRAL) and isinstance(dst_dt, _INTEGRAL)
    stringy = isinstance(src_dt, T.StringType) and isinstance(dst_dt, T.StringType)
    if not integral and not stringy:
        raise TypeError(
            f"connected_components ids must be integral or string, got "
            f"{src_dt.simpleString()}/{dst_dt.simpleString()} — cast "
            f"explicitly so id loss is impossible"
        )

    if integral:
        e = edges.select(
            F.col(src_col).cast("long").alias("a"),
            F.col(dst_col).cast("long").alias("b"),
        )
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).filter(F.col("a") != F.col("b")).distinct()
        labels = _propagate_long(sym, max_iter, checkpoint_every)
        return labels.select("node", F.col("label").alias("component"))

    # string ids: dictionary-encode to dense longs for the propagation loop
    # (hash-derived bigints would risk silent collisions at corpus scale).
    # monotonically_increasing_id is nondeterministic across recomputation,
    # so the mapping is frozen with an eager localCheckpoint; determinism of
    # the RESULT is restored by relabeling each component with its minimum
    # ORIGINAL id afterwards.
    e = edges.select(
        F.col(src_col).cast("string").alias("sa"),
        F.col(dst_col).cast("string").alias("sb"),
    ).filter(F.col("sa") != F.col("sb"))
    mapping = (
        e.select(F.col("sa").alias("id"))
        .unionByName(e.select(F.col("sb").alias("id")))
        .distinct()
        .withColumn("nid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    enc = (
        e.join(mapping.select(F.col("id").alias("sa"), F.col("nid").alias("a")), "sa")
        .join(mapping.select(F.col("id").alias("sb"), F.col("nid").alias("b")), "sb")
        .select("a", "b")
    )
    sym = enc.unionByName(
        enc.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).filter(F.col("a") != F.col("b")).distinct()
    labels = _propagate_long(sym, max_iter, checkpoint_every)
    decoded = labels.join(
        mapping.select(F.col("nid").alias("node"), F.col("id").alias("orig")), "node"
    ).select(F.col("orig").alias("node"), "label")
    comp_min = decoded.groupBy("label").agg(F.min("node").alias("component"))
    return decoded.join(comp_min, on="label").select("node", "component")


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs -> (doc_id, component, is_canonical): the dedup
    decision table. Keep rows with is_canonical; drop the rest. Docs with no
    pair partner are not listed (they are trivially canonical). Component ids
    are longs for integral doc ids, strings (the min doc id) for string
    doc ids."""
    cc = connected_components(pairs, src_col=a_col, dst_col=b_col)
    comp = F.col("component")
    if isinstance(cc.schema["component"].dataType, _INTEGRAL):
        comp = comp.cast("long")
    return cc.select(
        F.col("node").alias("doc_id"),
        comp.alias("component"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
