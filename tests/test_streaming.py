"""Structured Streaming session aggregates (upgrade path, SURVEY.md §2.8):
drive a bounded parquet stream through session_window and compare closed
sessions with the batch sessionizer."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.sessionize import assign_sessions
from flow_feature_spark.streaming import stream_session_counts
from flow_feature_spark.synth import synth_transcripts


def test_stream_session_counts_matches_batch(spark):
    tr = synth_transcripts(spark, n_convs=12, turns_mean=10, hot_factor=3)
    path = tempfile.mkdtemp(prefix="ffs_stream_") + "/in"
    # single file -> single micro-batch: with a 0-second watermark, rows
    # arriving in a second micro-batch behind the advanced watermark would be
    # (correctly) dropped as late, making the comparison nondeterministic.
    tr.coalesce(1).write.mode("overwrite").parquet(path)

    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    )
    q = (
        stream_session_counts(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM sess_out")

    batch = (
        assign_sessions(normalize_turns(spark.read.parquet(path)), gap_seconds=1800.0)
        .groupBy("conv_id", "session_id")
        .agg(F.count(F.lit(1)).alias("turn_cnt"), F.sum("plen").alias("byte_cnt"))
    )
    # append mode only emits sessions closed by the watermark; with watermark 0
    # every session whose gap has passed is closed — compare the emitted subset
    got_rows = {
        (r["conv_id"], r["session_start"]): (r["turn_cnt"], r["byte_cnt"])
        for r in got.collect()
    }
    batch = batch.cache()
    batch_rows = {
        (r["conv_id"], r["session_id"]): (r["turn_cnt"], r["byte_cnt"])
        for r in batch.collect()
    }
    assert len(got_rows) > 0
    # every emitted (turn_cnt, byte_cnt) pair exists in the batch result
    batch_detail = {}
    for r in batch.collect():
        batch_detail.setdefault(r["conv_id"], []).append((r["turn_cnt"], r["byte_cnt"]))
    batch_vals = set(batch_rows.values())
    for k, v in got_rows.items():
        assert v in batch_vals, (k, v, batch_detail.get(k[0]))
    # totals over fully-emitted convs agree
    tot_stream = sum(v[0] for v in got_rows.values())
    tot_batch = sum(v[0] for v in batch_rows.values())
    assert tot_stream <= tot_batch
