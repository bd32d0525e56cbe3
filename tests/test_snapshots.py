"""Snapshot log: Iceberg-shaped versioning on the manifest backend
(io.write_snapshot / read_snapshot / rollback_snapshot / expire_snapshots).

Reference basis: generalizes the joblib cache S4 replaces
(get_flow_feature.py:7-14) the same way write_checkpoint does, adding the
Iceberg table contract the north rule names — immutable snapshots, VERSION
AS OF / TIMESTAMP AS OF time travel, append-only rollback, expiration.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flow_feature_spark.io import (
    expire_snapshots,
    read_snapshot,
    rollback_snapshot,
    snapshot_history,
    write_snapshot,
)


def test_snapshot_commit_time_travel_rollback_expire(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    a = spark.range(5).withColumn("v", F.col("id") * 2)
    b = spark.range(9).withColumn("v", F.col("id") * 3)

    e1 = write_snapshot(a, tp, job="t")
    assert e1["snapshot_id"] == 1 and e1["parent_id"] is None and e1["rows"] == 5
    t_mid = int(time.time())
    time.sleep(1.1)  # committed_at_unix has second granularity
    e2 = write_snapshot(b, tp, job="t")
    assert e2["snapshot_id"] == 2 and e2["parent_id"] == 1

    # current state is the last commit; snapshot 1's directory is untouched
    assert read_snapshot(spark, tp).count() == 9
    assert sorted(
        r["v"] for r in read_snapshot(spark, tp, snapshot_id=1).collect()
    ) == [0, 2, 4, 6, 8]
    # TIMESTAMP AS OF between the two commits resolves to snapshot 1
    assert read_snapshot(spark, tp, as_of_unix=t_mid).count() == 5

    # rollback = NEW log entry pointing at snapshot 1's immutable dir
    e3 = rollback_snapshot(spark, tp, 1)
    assert e3["snapshot_id"] == 3 and e3["parent_id"] == 2
    assert read_snapshot(spark, tp).count() == 5
    hist = snapshot_history(spark, tp)
    assert [e["snapshot_id"] for e in hist] == [1, 2, 3]
    assert hist[2]["operation"] == "rollback_to_1"

    # expiration keeps directories still referenced by kept entries: with
    # keep_last=2 the kept rollback entry references snap 1's dir, so
    # nothing is deletable
    res = expire_snapshots(spark, tp, keep_last=2)
    assert res == {"expired": [], "kept": [2, 3]}
    assert read_snapshot(spark, tp, snapshot_id=1).count() == 5

    # a fourth commit then keep_last=1 expires everything else
    c = spark.range(2).withColumn("v", F.col("id"))
    e4 = write_snapshot(c, tp, job="t")
    res = expire_snapshots(spark, tp, keep_last=1)
    assert res["kept"] == [4]
    assert set(res["expired"]) == {1, 2, 3}
    assert read_snapshot(spark, tp).count() == 2
    # expired snapshots stay in the log for audit but are unreadable
    hist = snapshot_history(spark, tp)
    assert [e["snapshot_id"] for e in hist] == [1, 2, 3, 4]
    assert all(e["dir"] is None for e in hist[:3])
    try:
        read_snapshot(spark, tp, snapshot_id=2)
        raise AssertionError("expired snapshot must not be readable")
    except KeyError:
        pass
    assert e4["snapshot_id"] == 4


def test_snapshot_partitioned_write_reads_back(spark, tmp_path):
    tp = str(tmp_path / "ptbl")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("p"),
    )
    write_snapshot(df, tp, partition_cols=("p",))
    got = read_snapshot(spark, tp)
    assert got.count() == 100
    assert sorted(got.columns) == ["id", "p"]
    # partition pruning works on the snapshot directory
    assert got.filter(F.col("p") == "1").count() == 25
