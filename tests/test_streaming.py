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


def test_stateful_full_vector_matches_batch(spark):
    """Streaming applyInPandasWithState 72-vectors: closed sessions must be
    bit-identical (r6) to the batch fused kernel on the same data."""
    import numpy as np

    from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
    from flow_feature_spark.schema import FEATURE_NAMES
    from flow_feature_spark.streaming import stateful_session_features

    tr = synth_transcripts(spark, n_convs=15, turns_mean=12, hot_factor=4)
    turns = normalize_turns(tr).select(
        "conv_id", "turn_idx", "ts_us", "is_fwd", "plen", "win", "flags", "ihl"
    )
    path = tempfile.mkdtemp(prefix="ffs_state_") + "/in"
    turns.coalesce(1).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    q = (
        stateful_session_features(stream, gap_seconds=1800.0, rounding="r6")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["conv_id"], r["session_id"]): [r[n] for n in FEATURE_NAMES]
        for r in spark.sql("SELECT * FROM state_out").collect()
    }
    batch = {
        (r["conv_id"], r["session_id"]): [r[n] for n in FEATURE_NAMES]
        for r in sessionize_and_extract_fast(
            spark.read.parquet(path), 1800.0, rounding="r6"
        ).collect()
    }
    # append + NoTimeout: only CLOSED sessions are emitted — every emitted
    # vector must be bit-identical to the batch vector of the same session
    assert len(got) > 0
    for k, v in got.items():
        assert k in batch, k
        assert v == batch[k], (k, [
            (n, a, b) for n, a, b in zip(FEATURE_NAMES, v, batch[k]) if a != b
        ])
    # the only batch sessions missing from the stream are each conv's last
    # (still open in state)
    missing = set(batch) - set(got)
    per_conv_last = {}
    for conv, sid in batch:
        per_conv_last[conv] = max(per_conv_last.get(conv, 0), sid)
    assert all(sid == per_conv_last[conv] for conv, sid in missing)


def test_event_time_timeout_flushes_open_tails(spark):
    """EventTimeTimeout mode: once the watermark passes an open session's gap
    window, its tail vector is emitted — and the COMPLETE streaming output is
    bit-identical to the batch kernel over the same turns."""
    import os
    import time

    from pyspark.sql import functions as F2

    from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
    from flow_feature_spark.schema import FEATURE_NAMES
    from flow_feature_spark.streaming import stateful_session_features

    tr = synth_transcripts(spark, n_convs=10, turns_mean=8, hot_factor=2)
    turns = normalize_turns(tr).select(
        "conv_id", "turn_idx", "ts", "ts_us", "is_fwd", "plen", "win", "flags", "ihl"
    )
    path = tempfile.mkdtemp(prefix="ffs_timeout_") + "/in"

    # watermark advancers: two single-turn far-future rows, > gap apart (each
    # is a <2-turn session, dropped by the kernel in BOTH engines)
    max_us = turns.agg(F2.max("ts_us")).collect()[0][0]
    advancers = []
    for j, off in enumerate((10**9 * 3600, 10**9 * 3600 * 2)):
        adv_us = max_us + off
        advancers.append(
            turns.limit(1).select(
                F2.lit("zz_advancer").alias("conv_id"),
                F2.lit(j).cast("int").alias("turn_idx"),
                F2.timestamp_micros(F2.lit(adv_us)).alias("ts"),
                F2.lit(adv_us).alias("ts_us"),
                F2.lit(False).alias("is_fwd"),
                F2.lit(0).cast("long").alias("plen"),
                F2.lit(0).cast("long").alias("win"),
                F2.lit(0).cast("int").alias("flags"),
                F2.lit(0).cast("long").alias("ihl"),
            )
        )

    # three staged micro-batches (maxFilesPerTrigger=1, mtime-ordered):
    # data, then two watermark advancers so the timeout actually fires
    for i, df in enumerate([turns, *advancers]):
        sub = f"{path}/batch{i}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))

    schema = spark.read.parquet(f"{path}/batch0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/batch*")
    )
    q = (
        stateful_session_features(
            stream, gap_seconds=1800.0, rounding="r6",
            timeout="event_time", watermark="0 seconds",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("timeout_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["conv_id"], r["session_id"]): [r[n] for n in FEATURE_NAMES]
        for r in spark.sql("SELECT * FROM timeout_out").collect()
    }
    batch_in = spark.read.parquet(f"{path}/batch*").drop("ts")
    batch = {
        (r["conv_id"], r["session_id"]): [r[n] for n in FEATURE_NAMES]
        for r in sessionize_and_extract_fast(batch_in, 1800.0, rounding="r6").collect()
    }
    # tails flushed by the watermark => complete, bit-equal output
    assert set(got) == set(batch), (set(batch) - set(got), set(got) - set(batch))
    for k, v in got.items():
        assert v == batch[k], (k, [
            (n, a, b) for n, a, b in zip(FEATURE_NAMES, v, batch[k]) if a != b
        ])


def test_stream_dedup_turns_collapses_replay(spark, tmp_path):
    """availableNow stream over a directory containing a full file AND a
    replayed subset: the streaming dedup emits each (conv, turn) once."""
    import glob as _glob

    from flow_feature_spark.streaming import stream_dedup_turns
    from flow_feature_spark.synth import synth_transcripts

    src = f"{tmp_path}/in"
    base = synth_transcripts(spark, n_convs=6, turns_mean=8)
    base.coalesce(1).write.mode("overwrite").parquet(src)
    base.filter("turn_idx % 3 = 0").coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out_dir, cp = f"{tmp_path}/out", f"{tmp_path}/cp"
    q = (
        stream_dedup_turns(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    n_unique = base.select("conv_id", "turn_idx").distinct().count()
    assert got.count() == n_unique
    assert got.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0


def test_driver_stream_counts_equals_batch_oracle(spark):
    """The W7 driver query: availableNow session_window sessionization over
    the sf0.001 events table is BIT-IDENTICAL to the batch lag+cumsum
    sessionize_counts SQL (same oracle the driver hashes)."""
    import __spark_entry__ as entry
    from flow_feature_spark import oracle_queries as OQ

    got = sorted(map(tuple, entry.q_stream_counts(spark, entry.SF_SMOKE).collect()))
    spark.read.parquet(f"{entry.SF_SMOKE}/events.parquet").createOrReplaceTempView(
        "events"
    )
    want = sorted(map(tuple, spark.sql(OQ.sessionize_counts_sql("spark")).collect()))
    assert got == want and len(got) > 0


def test_stateful_features_checkpoint_restart_no_loss_no_dupes(spark, tmp_path):
    """S4's resumability promise extended to W7: kill the stateful streaming
    query while sessions are OPEN in the state store, restart it from the
    same checkpointLocation with the remaining turns, and the union of the
    two runs' sink output must be bit-identical to the batch kernel over all
    turns — no session lost (state restored across restart), none doubled
    (exactly-once sink commits via the checkpoint's metadata log)."""
    import os
    import time

    from pyspark.sql import functions as F2

    from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
    from flow_feature_spark.schema import FEATURE_NAMES
    from flow_feature_spark.streaming import stateful_session_features

    tr = synth_transcripts(spark, n_convs=10, turns_mean=8, hot_factor=2)
    turns = normalize_turns(tr).select(
        "conv_id", "turn_idx", "ts", "ts_us", "is_fwd", "plen", "win", "flags", "ihl"
    )
    cut = turns.approxQuantile("ts_us", [0.5], 0.0)[0]
    early, late = turns.filter(F2.col("ts_us") <= cut), turns.filter(F2.col("ts_us") > cut)
    assert early.count() > 0 and late.count() > 0

    max_us = turns.agg(F2.max("ts_us")).collect()[0][0]
    advancers = []
    for j, off in enumerate((10**9 * 3600, 10**9 * 3600 * 2)):
        adv_us = max_us + off
        advancers.append(
            turns.limit(1).select(
                F2.lit("zz_advancer").alias("conv_id"),
                F2.lit(j).cast("int").alias("turn_idx"),
                F2.timestamp_micros(F2.lit(adv_us)).alias("ts"),
                F2.lit(adv_us).alias("ts_us"),
                F2.lit(False).alias("is_fwd"),
                F2.lit(0).cast("long").alias("plen"),
                F2.lit(0).cast("long").alias("win"),
                F2.lit(0).cast("int").alias("flags"),
                F2.lit(0).cast("long").alias("ihl"),
            )
        )

    src = f"{tmp_path}/in"
    out_dir, cp = f"{tmp_path}/out", f"{tmp_path}/cp"

    def _stage(i, df):
        sub = f"{src}/batch{i}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))

    def _run():
        schema = spark.read.parquet(f"{src}/batch0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/batch*")
        )
        q = (
            stateful_session_features(
                stream, gap_seconds=1800.0, rounding="r6",
                timeout="event_time", watermark="0 seconds",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: only the early half is visible — the query drains it, commits
    # its offsets + state, and terminates with every conv's tail OPEN in the
    # state store (the "kill" point: a restart must recover those buffers)
    _stage(0, early)
    _run()
    emitted_mid = spark.read.parquet(out_dir).filter(
        F2.col("conv_id") != "zz_advancer"
    ).count()

    # run 2: the late half + two watermark advancers appear; a NEW query
    # resumes from the same checkpoint (file-source offsets skip batch0,
    # state store restores the open tails, advancers flush every tail)
    _stage(1, late)
    _stage(2, advancers[0])
    _stage(3, advancers[1])
    _run()

    got = {
        (r["conv_id"], r["session_id"]): [r[n] for n in FEATURE_NAMES]
        for r in spark.read.parquet(out_dir)
        .filter(F2.col("conv_id") != "zz_advancer")
        .collect()
    }
    batch = {
        (r["conv_id"], r["session_id"]): [r[n] for n in FEATURE_NAMES]
        for r in sessionize_and_extract_fast(
            turns.drop("ts"), 1800.0, rounding="r6"
        ).collect()
    }
    # the restart actually mattered: some sessions were only completable
    # with run-2 data (or tails flushed by run-2 watermarks)
    assert len(got) > emitted_mid
    # no loss, no duplicates, bit-equal vectors
    assert set(got) == set(batch), (set(batch) - set(got), set(got) - set(batch))
    for k, v in got.items():
        assert v == batch[k], (k, [
            (n, a, b) for n, a, b in zip(FEATURE_NAMES, v, batch[k]) if a != b
        ])


def _stage_mtime(base, i, df):
    import os
    import time

    sub = f"{base}/batch{i}"
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    stamp = time.time() + i * 10
    for root, _, files in os.walk(sub):
        for f in files:
            os.utime(os.path.join(root, f), (stamp, stamp))


def _run_asof_stream(spark, fdir, pdir, name, **kw):
    from flow_feature_spark.streaming import stream_asof_attach

    fstream = (
        spark.readStream.schema(spark.read.parquet(f"{fdir}/batch0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{fdir}/batch*")
    )
    pstream = (
        spark.readStream.schema(spark.read.parquet(f"{pdir}/batch0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{pdir}/batch*")
    )
    q = (
        stream_asof_attach(fstream, pstream, **kw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def test_stream_asof_attach_matches_batch_join(spark, tmp_path):
    """Randomized parity: the streaming as-of join over a multi-micro-batch
    replay (features and probes arriving through SEPARATE sources, chunked
    by time) must equal asof_join_union_window on the same static frames —
    one row per probe, strict zero-leakage, NULL rows for entities with no
    qualifying feature. Watermark delay covers the staging skew between the
    two sources; far-future advancer features push the watermark past every
    probe so EventTimeTimeout flushes all pending answers."""
    import random

    from pyspark.sql import functions as F2

    from flow_feature_spark.asof import asof_join_union_window

    rng = random.Random(20260817)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    day_us = 86_400_000_000
    feats_rows = []
    for i in range(220):
        ent = f"e{rng.randrange(20)}"
        ts = base_us + rng.randrange(5 * day_us)
        # fid near 2^62: any float64 widening on the state path would
        # corrupt the low bits (the bug class the non-null payload struct
        # exists to prevent)
        feats_rows.append((ent, ts, (1 << 62) + i * 1001, rng.randrange(1000) / 8.0))
    probe_rows = []
    for _ in range(160):
        ent = f"e{rng.randrange(22)}"  # e20/e21 have no features -> NULL rows
        probe_rows.append((ent, base_us + rng.randrange(5 * day_us)))

    feats = spark.createDataFrame(
        [(e, t, s, v) for e, t, s, v in feats_rows],
        "conv_id string, ts_us long, fid long, fscore double",
    ).select(
        "conv_id",
        F2.timestamp_micros("ts_us").alias("feature_ts"),
        "fid",
        "fscore",
    )
    probes = spark.createDataFrame(
        probe_rows, "entity_id string, ts_us long"
    ).select("entity_id", F2.timestamp_micros("ts_us").alias("probe_ts"))

    want = sorted(
        map(
            tuple,
            asof_join_union_window(feats, probes, strict=True).collect(),
        )
    )

    # chunk both sources at the same global time boundaries (in-order
    # arrival per source); watermark delay = full span so inter-source
    # trigger skew can never late-drop a row
    t1, t2 = base_us + 2 * day_us, base_us + 4 * day_us
    fdir, pdir = f"{tmp_path}/f", f"{tmp_path}/p"
    us = F2.unix_micros(F2.col("feature_ts"))
    _stage_mtime(fdir, 0, feats.filter(us < t1))
    _stage_mtime(fdir, 1, feats.filter((us >= t1) & (us < t2)))
    _stage_mtime(fdir, 2, feats.filter(us >= t2))
    adv = lambda j, off: spark.createDataFrame(  # noqa: E731
        [("zz_adv", base_us + off, -1, 0.0)],
        "conv_id string, ts_us long, fid long, fscore double",
    ).select(
        "conv_id",
        F2.timestamp_micros("ts_us").alias("feature_ts"),
        "fid",
        "fscore",
    )
    # advancers must clear max_probe + watermark delay; a delay much
    # shorter than the 5-day span forces MID-STREAM answering + feature
    # eviction between chunks (the paths a full-span delay never hits);
    # aligned chunk boundaries keep any positive delay late-drop-free
    _stage_mtime(fdir, 3, adv(0, 12 * day_us))
    _stage_mtime(fdir, 4, adv(1, 15 * day_us))
    pus = F2.unix_micros(F2.col("probe_ts"))
    _stage_mtime(pdir, 0, probes.filter(pus < t1))
    _stage_mtime(pdir, 1, probes.filter((pus >= t1) & (pus < t2)))
    _stage_mtime(pdir, 2, probes.filter(pus >= t2))

    got_df = _run_asof_stream(
        spark, fdir, pdir, "asof_stream_rand", strict=True,
        watermark="12 hours",
    )
    got = sorted(map(tuple, got_df.collect()))
    assert len(got) == len(probe_rows)
    assert got == want


def test_stream_asof_attach_tie_tolerance_and_null(spark, tmp_path):
    """Pinned semantics: strict probe at a feature's exact ts sees only the
    EARLIER feature; inclusive sees it; max-staleness tolerance NULLs a
    stale match; a probe for an entity with no features still emits its
    NULL-padded row."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F2

    base = datetime(2024, 1, 1)
    s = lambda x: base + timedelta(seconds=x)  # noqa: E731
    feats = spark.createDataFrame(
        [("e1", s(50), 7), ("e1", s(100), 8), ("e2", s(0), 9)],
        "conv_id string, feature_ts timestamp, fid long",
    )
    probes = spark.createDataFrame(
        [("e1", s(100)), ("e2", s(500)), ("e3", s(10))],
        "entity_id string, probe_ts timestamp",
    )
    adv = lambda j: spark.createDataFrame(  # noqa: E731
        [(f"zz{j}", s(10_000 * (j + 1)), -1)],
        "conv_id string, feature_ts timestamp, fid long",
    )
    for variant, kw, e1_want in [
        ("strict", dict(strict=True), 7),
        ("incl", dict(strict=False), 8),
    ]:
        fdir, pdir = f"{tmp_path}/f_{variant}", f"{tmp_path}/p_{variant}"
        _stage_mtime(fdir, 0, feats)
        _stage_mtime(fdir, 1, adv(0))
        _stage_mtime(fdir, 2, adv(1))
        _stage_mtime(pdir, 0, probes)
        got = {
            r["entity_id"]: r["fid"]
            for r in _run_asof_stream(
                spark, fdir, pdir, f"asof_stream_{variant}",
                watermark="0 seconds",
                tolerance_seconds=120.0, **kw,
            ).collect()
        }
        # e2's only feature is 500s stale (> 120s tolerance) -> NULL;
        # e3 has no features at all -> NULL row still emitted
        assert got == {"e1": e1_want, "e2": None, "e3": None}, (variant, got)


def test_stream_asof_checkpoint_restart_no_loss_no_dupes(spark, tmp_path):
    """S4's resumability extended to the streaming as-of join: run 1 drains
    the feature/probe files and terminates with probes PENDING in the state
    store (watermark hasn't passed them); run 2 restarts a NEW query from
    the same checkpointLocation with advancer features appended — the
    restored state must answer every pending probe exactly once, and the
    union of both runs' sink output must equal the batch join."""
    import os
    import time

    from pyspark.sql import functions as F2

    from flow_feature_spark.asof import asof_join_union_window
    from flow_feature_spark.streaming import stream_asof_attach

    base_us = 1_704_067_200_000_000
    feats = spark.createDataFrame(
        [(f"e{i % 7}", base_us + i * 60_000_000, (1 << 62) + i)
         for i in range(40)],
        "conv_id string, ts_us long, fid long",
    ).select("conv_id", F2.timestamp_micros("ts_us").alias("feature_ts"), "fid")
    probes = spark.createDataFrame(
        [(f"e{i % 9}", base_us + 30_000_000 + i * 55_000_000)
         for i in range(60)],
        "entity_id string, ts_us long",
    ).select("entity_id", F2.timestamp_micros("ts_us").alias("probe_ts"))
    want = sorted(
        map(tuple, asof_join_union_window(feats, probes, strict=True).collect())
    )

    fdir, pdir = f"{tmp_path}/f", f"{tmp_path}/p"
    out_dir, cp = f"{tmp_path}/out", f"{tmp_path}/cp"
    _stage_mtime(fdir, 0, feats)
    _stage_mtime(pdir, 0, probes)

    def _run():
        def src(b):
            return (
                spark.readStream.schema(
                    spark.read.parquet(f"{b}/batch0").schema
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{b}/batch*")
            )

        q = (
            stream_asof_attach(
                src(fdir), src(pdir), strict=True, watermark="600 seconds"
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: the 600 s watermark delay keeps every probe within 600 s of the
    # max event time PENDING in state — the "kill point" a restart must
    # recover from
    _run()
    mid = (
        spark.read.parquet(out_dir).count()
        if os.path.isdir(out_dir) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(out_dir) for f in fs
        )
        else 0
    )
    assert mid < len(want)

    adv = lambda j: spark.createDataFrame(  # noqa: E731
        [(f"zz{j}", base_us + (100 + j) * 86_400_000_000, -1)],
        "conv_id string, ts_us long, fid long",
    ).select("conv_id", F2.timestamp_micros("ts_us").alias("feature_ts"), "fid")
    _stage_mtime(fdir, 1, adv(0))
    _stage_mtime(fdir, 2, adv(1))
    _run()

    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert len(got) == len(want)  # every probe exactly once across both runs
    assert got == want


def test_stream_append_snapshot_exactly_once(spark, tmp_path):
    """Streaming ingestion into the snapshot table: availableNow drains the
    staged batches as fast-append commits; a rerun from the same checkpoint
    commits nothing; a REPLAYED batch id (the crash-between-commit-and-
    checkpoint case foreachBatch is at-least-once about) is skipped by the
    sink's batch-id ledger; a newly arrived file commits exactly once."""
    import os
    import time

    from flow_feature_spark.io import read_snapshot, snapshot_history
    from flow_feature_spark.streaming import (
        snapshot_append_sink,
        stream_append_snapshot,
    )

    src, cp, tbl = f"{tmp_path}/in", f"{tmp_path}/cp", f"{tmp_path}/tbl"

    def _stage(i, lo, hi):
        sub = f"{src}/batch{i}"
        spark.range(lo, hi).coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))

    _stage(0, 0, 10)
    _stage(1, 10, 25)

    def _run():
        schema = spark.read.parquet(f"{src}/batch0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/batch*")
        )
        stream_append_snapshot(stream, tbl, cp, job="t")

    _run()
    assert sorted(r["id"] for r in read_snapshot(spark, tbl).collect()) == list(range(25))
    log1 = snapshot_history(spark, tbl)
    assert [e.get("stream_batch_id") for e in log1] == [0, 1]
    assert all(e["operation"] == "append" for e in log1)

    # resume with nothing new: no commits
    _run()
    assert len(snapshot_history(spark, tbl)) == 2

    # crash replay: the sink sees an already-committed batch id and skips
    snapshot_append_sink(tbl, job="t")(spark.range(10, 25), 1)
    assert len(snapshot_history(spark, tbl)) == 2
    assert read_snapshot(spark, tbl).count() == 25

    # late-arriving file: exactly one more commit with only its rows
    _stage(2, 25, 30)
    _run()
    log3 = snapshot_history(spark, tbl)
    assert len(log3) == 3 and log3[-1]["rows"] == 5
    assert sorted(r["id"] for r in read_snapshot(spark, tbl).collect()) == list(range(30))


def test_compact_snapshot_collapses_chain_history_preserved(spark, tmp_path):
    from flow_feature_spark.io import (
        compact_snapshot,
        read_snapshot,
        snapshot_history,
        write_snapshot,
    )

    tbl = f"{tmp_path}/ctbl"
    write_snapshot(spark.range(10), tbl, job="t")
    for lo in (10, 20, 30):
        write_snapshot(
            spark.range(lo, lo + 10), tbl, job="t", operation="append"
        )
    assert len(snapshot_history(spark, tbl)[-1]["dirs"]) == 4
    entry = compact_snapshot(spark, tbl, target_files=2)
    assert entry["dirs"] == [entry["dir"]]  # one directory now
    assert sorted(r["id"] for r in read_snapshot(spark, tbl).collect()) == list(range(40))
    # history preserved: the pre-compaction snapshot still reads
    assert read_snapshot(spark, tbl, snapshot_id=4).count() == 40
    assert read_snapshot(spark, tbl, snapshot_id=1).count() == 10


def test_stream_decayed_counts_matches_batch_grid(spark):
    """stream_decayed_counts over a staged multi-micro-batch replay emits
    EXACTLY the batch dense grid (gap buckets included, decayed_num
    bit-identical), and state expires after lookback+1 silent buckets."""
    import os
    import random
    import time

    from pyspark.sql import functions as F2

    from flow_feature_spark.streaming import stream_decayed_counts
    from flow_feature_spark.timeseries import decayed_counts, resample_counts

    B_US = 1_000_000  # 1s buckets
    K = 6
    rng = random.Random(23)
    rows = []
    for i in range(400):
        # clustered with deliberate multi-bucket gaps
        base = rng.choice([0, 15, 40]) * B_US
        rows.append((
            rng.randrange(5),
            base + rng.randrange(0, 10 * B_US),
            i,
        ))
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, i long").select(
        "user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us"
    )

    path = tempfile.mkdtemp(prefix="ffs_sdecay_") + "/in"
    max_us = ev.agg(F2.max("ts_us")).collect()[0][0]
    # split data into two micro-batches + two far-future advancers
    half = ev.filter(F2.col("ts_us") % 2 == 0)
    half2 = ev.filter(F2.col("ts_us") % 2 == 1)
    advancers = [
        spark.createDataFrame(
            [(-1, max_us + off)], "user_id long, ts_us long"
        ).select("user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us")
        for off in (3600 * B_US, 7200 * B_US)
    ]
    for i, df in enumerate([half, half2, *advancers]):
        sub = f"{path}/batch{i}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))

    schema = spark.read.parquet(f"{path}/batch0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/batch*")
    )
    q = (
        stream_decayed_counts(stream, "user_id", "ts", B_US, lookback=K)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sdecay_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["bucket_idx"]):
            (r["bucket_start_us"], r["n_events"], r["decayed_num"], r["decayed"])
        for r in spark.sql(
            "SELECT * FROM sdecay_out WHERE user_id >= 0"
        ).collect()
    }
    grid = resample_counts(
        ev.select("user_id", "ts_us"), "user_id", "ts_us", B_US
    )
    want = {
        (r["user_id"], r["bucket_idx"]):
            (r["bucket_start_us"], r["n_events"], r["decayed_num"], r["decayed"])
        for r in decayed_counts(grid, "user_id", "bucket_idx", "n_events",
                                lookback=K).collect()
    }
    assert set(got) == set(want), (
        len(got), len(want),
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5],
    )
    assert got == want


def test_stream_decayed_state_continues_across_silent_gap(spark):
    """An entity that goes silent for < lookback buckets and returns must
    continue its decay history (the ring survives a full drain) — pinned by
    comparing against the batch grid whose lag window spans the gap."""
    import os
    import time

    from pyspark.sql import functions as F2

    from flow_feature_spark.streaming import stream_decayed_counts
    from flow_feature_spark.timeseries import decayed_counts, resample_counts

    B_US = 1_000_000
    K = 8
    # burst at bucket E (8 events), silence for 4 buckets, one event 5
    # buckets later: its decay must still carry the burst. Timestamps sit at
    # a realistic epoch: rows at/below the INITIAL watermark (epoch 0) are
    # dropped by Spark's stateful late-row filter, so ts=0 never reaches fn.
    E_US = 1_700_000_000 * 1_000_000
    rows = [(1, E_US + i * 1000, i) for i in range(8)] + [
        (1, E_US + 5 * B_US + 10, 99)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, i long").select(
        "user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us"
    )
    path = tempfile.mkdtemp(prefix="ffs_sdecay2_") + "/in"
    # burst batch, then the late event, then an advancer — three triggers, so
    # the burst's buckets drain fully BEFORE the late event arrives
    burst = ev.filter(F2.col("ts_us") < E_US + B_US)
    late = ev.filter(F2.col("ts_us") >= E_US + B_US)
    adv = spark.createDataFrame(
        [(-1, E_US + 3600 * B_US)], "user_id long, ts_us long"
    ).select("user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us")
    for i, df in enumerate([burst, late, adv]):
        sub = f"{path}/batch{i}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))
    schema = spark.read.parquet(f"{path}/batch0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/batch*")
    )
    q = (
        stream_decayed_counts(stream, "user_id", "ts", B_US, lookback=K)
        .writeStream.outputMode("append")
        .format("memory").queryName("sdecay2_out").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["bucket_idx"]: r["decayed_num"]
        for r in spark.sql(
            "SELECT * FROM sdecay2_out WHERE user_id = 1"
        ).collect()
    }
    grid = resample_counts(
        ev.select("user_id", "ts_us"), "user_id", "ts_us", B_US
    )
    want = {
        r["bucket_idx"]: r["decayed_num"]
        for r in decayed_counts(grid, "user_id", "bucket_idx", "n_events",
                                lookback=K).collect()
    }
    assert got == want
    # the gap really was spanned: the late bucket carries the burst's mass
    b0 = E_US // B_US
    assert got[b0 + 5] == (8 << (K - 5)) + (1 << K)


def test_stream_decayed_optin_expiry_restarts_segments_with_exact_values(spark):
    """expire_after_silent_buckets=N drops state after N+1 silent buckets:
    the grid RESTARTS at the next event (the silent stretch's zero rows are
    not emitted) but every emitted decayed value is exact — the ring is
    provably zeros past lookback silence, so expired == fresh. Also pins
    the expiry < lookback wall."""
    import os
    import time

    import pytest as _pytest

    from pyspark.sql import functions as F2

    from flow_feature_spark.streaming import stream_decayed_counts

    B_US = 1_000_000
    K = 4
    E_US = 1_700_000_000 * 1_000_000
    # events at buckets 0-1, then silence for 20 buckets (> N+1), then 25
    rows = [(1, E_US + 100, 0), (1, E_US + B_US + 100, 1),
            (1, E_US + 25 * B_US + 100, 2)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, i long").select(
        "user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us"
    )
    with _pytest.raises(ValueError, match="expire_after_silent_buckets"):
        stream_decayed_counts(ev, "user_id", "ts", B_US, lookback=K,
                              expire_after_silent_buckets=K - 1)

    path = tempfile.mkdtemp(prefix="ffs_sdecay3_") + "/in"
    early = ev.filter(F2.col("ts_us") < E_US + 2 * B_US)
    late = ev.filter(F2.col("ts_us") >= E_US + 2 * B_US)
    def _adv(off_buckets):
        return spark.createDataFrame(
            [(-1, E_US + off_buckets * B_US)], "user_id long, ts_us long"
        ).select("user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us")

    # watermark lags one trigger: adv(10) makes wm pass the pending buckets,
    # adv(12)'s trigger FIRES the drain timeout (emit 0,1; pending empty;
    # wm 10 past expire bucket 6 -> state removed), then the late event
    # starts a FRESH segment and adv(3600) drains it
    for i, df in enumerate([early, _adv(10), _adv(12), late, _adv(3600)]):
        sub = f"{path}/batch{i}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))
    schema = spark.read.parquet(f"{path}/batch0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/batch*")
    )
    q = (
        stream_decayed_counts(stream, "user_id", "ts", B_US, lookback=K,
                              expire_after_silent_buckets=K)
        .writeStream.outputMode("append")
        .format("memory").queryName("sdecay3_out").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["bucket_idx"] - E_US // B_US: r["decayed_num"]
        for r in spark.sql(
            "SELECT * FROM sdecay3_out WHERE user_id = 1").collect()
    }
    # segment 1: buckets 0..1 emitted before expiry... and NOTHING between
    # 2 and 24 (state expired; with retention those zero rows would exist);
    # segment 2 restarts at 25 with a FRESH ring — exact, since 23 silent
    # buckets > lookback means the carried history is zero anyway
    assert got[0] == 1 << K and got[1] == (1 << K) + (1 << (K - 1))
    assert 25 in got and got[25] == 1 << K
    assert not any(2 <= b <= 24 for b in got)


def test_stream_decayed_checkpoint_restart_no_loss_no_dupes(spark, tmp_path):
    """S4's resumability extended to the streaming decay engine: kill the
    query with rings + pending buckets live in the state store, restart from
    the same checkpointLocation with the late half + advancers, and the
    union of both runs' sink output must equal the batch decayed grid
    exactly — no bucket lost (state restored), none doubled (exactly-once
    sink commits)."""
    import os
    import random
    import time

    from pyspark.sql import functions as F2

    from flow_feature_spark.streaming import stream_decayed_counts
    from flow_feature_spark.timeseries import decayed_counts, resample_counts

    B_US = 1_000_000
    K = 6
    E_US = 1_700_000_000 * 1_000_000
    rng = random.Random(47)
    rows = [(rng.randrange(5), E_US + rng.randrange(0, 40 * B_US), i)
            for i in range(400)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, i long").select(
        "user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us"
    )
    mid = E_US + 20 * B_US
    early, late = ev.filter(F2.col("ts_us") <= mid), ev.filter(F2.col("ts_us") > mid)
    assert early.count() > 0 and late.count() > 0
    max_us = ev.agg(F2.max("ts_us")).collect()[0][0]
    advancers = [
        spark.createDataFrame([(-1, max_us + off)], "user_id long, ts_us long")
        .select("user_id", F2.timestamp_micros("ts_us").alias("ts"), "ts_us")
        for off in (3600 * B_US, 7200 * B_US)
    ]
    src, out_dir, cp = f"{tmp_path}/in", f"{tmp_path}/out", f"{tmp_path}/cp"

    def _stage(i, df):
        sub = f"{src}/batch{i}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))

    def _run():
        schema = spark.read.parquet(f"{src}/batch0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/batch*")
        )
        q = (
            stream_decayed_counts(stream, "user_id", "ts", B_US, lookback=K)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _stage(0, early)
    _run()  # run 1 ends with every entity's ring/pending live in state
    _stage(1, late)
    _stage(2, advancers[0])
    _stage(3, advancers[1])
    _run()  # run 2 resumes offsets + state from the checkpoint

    got = {
        (r["user_id"], r["bucket_idx"]): (r["n_events"], r["decayed_num"], r["decayed"])
        for r in spark.read.parquet(out_dir).filter("user_id >= 0").collect()
    }
    grid = resample_counts(ev.select("user_id", "ts_us"), "user_id", "ts_us", B_US)
    want = {
        (r["user_id"], r["bucket_idx"]): (r["n_events"], r["decayed_num"], r["decayed"])
        for r in decayed_counts(grid, "user_id", "bucket_idx", "n_events",
                                lookback=K).collect()
    }
    assert set(got) == set(want), (len(got), len(want))
    assert got == want
