"""Edit-distance fuzzy join: all pairs of short strings within Levenshtein
distance ``d`` — without the all-pairs cross join.

Entity resolution over a training corpus (near-identical titles, user
handles, tool names with typos) needs exact small-distance matching at
corpus scale. The scale path here is the deletion-neighborhood (SymSpell)
banding: every string emits itself plus every string reachable by deleting
up to ``d`` characters; two strings within Levenshtein distance ``d``
ALWAYS share at least one variant (for d=1: equal strings share themselves;
a deletion/insertion pair shares the shorter string; a substitution pair
shares the string with the substituted position deleted — and inductively
for d=2). The variant equi-join therefore has NO false negatives; false
positives (e.g. transpositions at distance 2 sharing a d=1 variant) are
removed by an exact ``levenshtein()`` check on the candidate pairs, so the
result is exactly the brute-force pair set (randomized brute-force tests
pin this).

Scale shape: variants are generated map-side (explode over a position
``sequence()`` — all JVM codegen, no Python); the join is a hash equi-join
on the variant string, so work is proportional to sum of squared variant-
bucket sizes, never corpus^2. Hot variants (very common short strings)
are the skew surface: ``max_bucket`` optionally drops variants whose
frequency exceeds the cap — a LOUD recall trade documented at the call
site, never a silent default — and AQE skew-join splitting handles the
rest. Verification cost is one ``levenshtein(a, b, threshold=d)`` per
candidate (early-exit JVM implementation).

Reference basis: the reference dedups flows by exact 5-tuple key only
(flow.py:29-60); approximate matching is a training-corpus need the
SURVEY §2.9 dedup family (C3-C7) covers for documents — this operator is
its short-string, exact-threshold sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(
    df: DataFrame, id_col: str, s_col: str, max_distance: int = 1
) -> DataFrame:
    """(id, s, variant): the string itself plus every <=``max_distance``-
    deletion variant, distinct per id. Strings must be non-null; empty
    strings emit only themselves."""
    if max_distance not in (1, 2):
        raise ValueError("max_distance must be 1 or 2")
    base = df.select(F.col(id_col).alias("_id"), F.col(s_col).alias("_s"))
    # one deletion: position i in 1..len; i=0 keeps the string itself
    del1 = base.select(
        "_id",
        "_s",
        F.explode(F.sequence(F.lit(0), F.length("_s"))).alias("_i"),
    ).select(
        "_id",
        "_s",
        F.when(F.col("_i") == 0, F.col("_s"))
        .otherwise(
            F.concat(
                F.expr("substring(_s, 1, _i - 1)"),
                F.expr("substring(_s, _i + 1, length(_s))"),
            )
        )
        .alias("variant"),
    )
    if max_distance == 1:
        out = del1
    else:
        # second deletion applied to each first-round variant (which
        # includes the original at _i=0, so <=2 deletions total)
        out = del1.select(
            "_id",
            "_s",
            F.explode(F.sequence(F.lit(0), F.length("variant"))).alias("_j"),
            F.col("variant").alias("_v1"),
        ).select(
            "_id",
            "_s",
            F.when(F.col("_j") == 0, F.col("_v1"))
            .otherwise(
                F.concat(
                    F.expr("substring(_v1, 1, _j - 1)"),
                    F.expr("substring(_v1, _j + 1, length(_v1))"),
                )
            )
            .alias("variant"),
        )
    return (
        out.distinct()
        .withColumnRenamed("_id", id_col)
        .withColumnRenamed("_s", s_col)
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    max_distance: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with ``levenshtein(s_a, s_b) <= max_distance``.

    Output: (id_a, id_b, dist). Exact — equal to the brute-force cross
    join — unless ``max_bucket`` is set, in which case variants shared by
    more than ``max_bucket`` strings are dropped before the join: pairs
    whose EVERY shared variant is that common can be missed (recall trade
    for bounded bucket work; the exact result is unaffected for pairs that
    share any rarer variant). NULL strings are rejected loudly: silently
    dropping them would understate the duplicate surface.
    """
    s = F.col(s_col)
    guarded = df.select(
        F.col(id_col).alias(id_col),
        F.when(
            s.isNull(),
            F.raise_error(F.lit(
                "edit_distance_pairs: NULL string; filter or fill explicitly"
            )),
        ).otherwise(s).alias(s_col),
    )
    var = deletion_variants(guarded, id_col, s_col, max_distance)
    if max_bucket is not None:
        if max_bucket < 1:
            raise ValueError("max_bucket must be >= 1")
        freq = var.groupBy("variant").agg(F.count(F.lit(1)).alias("_n"))
        var = (
            var.join(
                freq.filter(F.col("_n") <= max_bucket).hint("merge"),
                "variant",
                "inner",
            )
            .drop("_n")
        )
    a = var.select(
        F.col("variant"),
        F.col(id_col).alias("id_a"),
        F.col(s_col).alias("_sa"),
    )
    b = var.select(
        F.col("variant"),
        F.col(id_col).alias("id_b"),
        F.col(s_col).alias("_sb"),
    )
    # Both sides are variant-exploded (|s|^d rows per string) and therefore
    # never broadcastable at design scale; AQE's size estimate of the
    # post-explode side can be wildly low and a mis-planned broadcast of
    # ~1e8 variant rows kills the driver on maxResultSize (measured at 1e6
    # strings d=2 — 137M variants). Pin SORT-MERGE specifically: a
    # shuffle_hash pin trades the driver death for an executor one — SHJ
    # builds a per-partition in-memory hash map of the build side, which
    # cannot spill, and 137M variant rows / 64 partitions blew task
    # execution memory ("not enough memory to build hash map"). SMJ spills
    # both sides and is the only strategy that survives the design scale.
    cand = (
        a.join(b.hint("merge"), "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    # threshold form early-exits in the JVM and returns -1 past the bound;
    # keep 0 <= dist <= d (the -1 sentinel must not pass a <= filter)
    return (
        cand.withColumn(
            "dist", F.levenshtein("_sa", "_sb", max_distance)
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_distance))
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )
