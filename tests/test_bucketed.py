"""Bucketed-table co-located joins: identically-bucketed tables join with
ZERO shuffle exchanges (the pre-partitioning strategy for repeatedly-joined
10^12-row tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flow_feature_spark.io import write_bucketed_table
from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.synth import synth_transcripts


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    turns = normalize_turns(synth_transcripts(spark, n_convs=50, turns_mean=10))
    feats = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"), F.sum("plen").alias("total_plen")
    )
    write_bucketed_table(
        turns.select("conv_id", "turn_idx", "ts_us", "plen"),
        "t_turns_b", f"{tmp_path}/turns", n_buckets=8,
        sort_cols=("conv_id",),
    )
    write_bucketed_table(
        feats, "t_feats_b", f"{tmp_path}/feats", n_buckets=8,
        sort_cols=("conv_id",),
    )
    try:
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_turns_b")
        b = spark.table("t_feats_b")
        joined = a.join(b, "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        # and the result is correct vs a plain (shuffling) join
        expected = (
            turns.select("conv_id", "turn_idx", "ts_us", "plen")
            .join(feats, "conv_id").count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_turns_b")
        spark.sql("DROP TABLE IF EXISTS t_feats_b")
