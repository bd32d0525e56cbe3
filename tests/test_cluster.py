"""Connected components / dedup clustering (ops/cluster.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flow_feature_spark.ops.cluster import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cc(spark, pairs, **kw):
    out = connected_components(_edges(spark, pairs), **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components_and_selfloop(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (11, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    """Worst-case diameter regime (the one large-star/small-star targets):
    a 30-node path must still collapse to the single min label."""
    n = 30
    got = _cc(spark, [(i, i + 1) for i in range(n)], max_iter=40)
    assert set(got.values()) == {0} and len(got) == n + 1


def test_ring_and_cross_edges(spark):
    ring = [(i, (i + 1) % 8) for i in range(8)]
    got = _cc(spark, ring + [(3, 20), (20, 21)])
    assert set(got.values()) == {0} and got[21] == 0


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(20)], max_iter=2)


def test_partitioning_invariance(spark):
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6), (21, 22)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, connected_components(e).collect()))
    b = sorted(map(tuple, connected_components(e.repartition(13)).collect()))
    assert a == b


def test_string_ids_dictionary_encoded(spark):
    """Non-integral doc ids (content hashes, URLs) must cluster correctly —
    the old cast('long') NULLed them and silently dropped every edge.
    Component = lexicographic min original id, deterministically."""
    e = spark.createDataFrame(
        [("sha_b", "sha_c"), ("sha_a", "sha_b"), ("url_x", "url_y")],
        "src string, dst string",
    )
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == {
        "sha_a": "sha_a", "sha_b": "sha_a", "sha_c": "sha_a",
        "url_x": "url_x", "url_y": "url_x",
    }
    # repartitioning must not change the (nondeterministically encoded,
    # deterministically decoded) result
    got2 = {
        r["node"]: r["component"]
        for r in connected_components(e.repartition(7)).collect()
    }
    assert got2 == got


def test_string_ids_dedup_clusters(spark):
    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docC", "docB")], "doc_a string, doc_b string"
    )
    rows = {r["doc_id"]: (r["component"], r["is_canonical"])
            for r in dedup_clusters(pairs).collect()}
    assert rows == {
        "docA": ("docA", True),
        "docB": ("docA", False),
        "docC": ("docA", False),
    }


def test_unsupported_id_type_raises(spark):
    e = spark.createDataFrame([(1.5, 2.5)], "src double, dst double")
    with pytest.raises(TypeError, match="integral or string"):
        connected_components(e)


def test_one_job_per_iteration(spark):
    """The convergence count must ride the same action that materializes the
    round's labels — one Spark job per propagation round (plus the two setup
    jobs: edge persist-count and the final-round detection), not two."""
    sc = spark.sparkContext
    n = 30  # path graph: worst-case diameter, many rounds
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    e.count()  # warm any scan-side lazies outside the measured group
    # with AQE on, ONE action fans out into one job per shuffle stage, and a
    # BroadcastExchange launches its own driver-side collect job — disable
    # both for the measurement so Spark-job count == action count
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    bct = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup("cc_jobcount", "cc job-count assertion")
    try:
        connected_components(e, max_iter=40, checkpoint_every=1000).count()
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bct)
    jobs = len(sc.statusTracker().getJobIdsForGroup("cc_jobcount"))
    # rounds needed for a 31-node path with pointer jumping is ~log2(30)+c;
    # allow: 1 (sym persist count) + rounds (one job each) + 1 (caller count).
    # The old two-jobs-per-round shape would roughly double this.
    assert jobs <= 12, f"expected <=12 jobs for the whole run, saw {jobs}"


def test_dedup_clusters_canonical_flag(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (30, 31)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: (r["component"], r["is_canonical"])
            for r in dedup_clusters(pairs).collect()}
    assert rows == {
        5: (5, True), 9: (5, False), 7: (5, False),
        30: (30, True), 31: (30, False),
    }
    # dedup decision: exactly one canonical per component
    per_comp = {}
    for comp, canon in rows.values():
        per_comp[comp] = per_comp.get(comp, 0) + int(canon)
    assert all(v == 1 for v in per_comp.values())
