"""Checkpoint/resume semantics (north rule: resumable with per-partition
lineage + metrics) — SURVEY.md §5.6."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from flow_feature_spark.io import (
    KernelMetrics,
    input_fingerprint_for,
    read_manifest,
    resume_or_compute,
    write_checkpoint,
)
from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.sessionize import dedup_turns
from flow_feature_spark.synth import synth_transcripts


@pytest.fixture()
def tmppath():
    d = tempfile.mkdtemp(prefix="ffs_resume_")
    yield os.path.join(d, "out")
    shutil.rmtree(d, ignore_errors=True)


def _features(spark, metrics=None):
    tr = synth_transcripts(spark, n_convs=20, turns_mean=15, hot_factor=5)
    return sessionize_and_extract_fast(
        normalize_turns(tr), gap_seconds=1800.0, rounding="r6", metrics=metrics
    )


def test_checkpoint_commit_and_resume(spark, tmppath):
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return _features(spark)

    fp = "test-input-v1"
    df1, resumed1 = resume_or_compute(spark, tmppath, "features", compute, fp)
    assert not resumed1 and calls["n"] == 1
    n1 = df1.count()

    df2, resumed2 = resume_or_compute(spark, tmppath, "features", compute, fp)
    assert resumed2 and calls["n"] == 1  # no recompute
    assert df2.count() == n1

    # changed input fingerprint -> recompute
    df3, resumed3 = resume_or_compute(spark, tmppath, "features", compute, "v2")
    assert not resumed3 and calls["n"] == 2


def test_aborted_write_recomputes(spark, tmppath):
    feats = _features(spark)
    # simulate a crash: data written but manifest never committed
    feats.write.mode("overwrite").parquet(tmppath)
    assert read_manifest(tmppath) is None
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return _features(spark)

    _, resumed = resume_or_compute(spark, tmppath, "features", compute, "fp")
    assert not resumed and calls["n"] == 1
    assert read_manifest(tmppath) is not None


def test_metrics_lineage_in_manifest(spark, tmppath):
    metrics = KernelMetrics.create(spark)
    feats = _features(spark, metrics=metrics)
    m = write_checkpoint(feats, tmppath, "features", "fp", metrics=metrics)
    assert m["rows"] == feats.count()
    snap = m["metrics"]
    assert snap["rows_out"] >= m["rows"]  # kernel may run before final count
    assert snap["rows_in"] > 0 and snap["batches"] > 0
    assert sum(snap["rows_in_by_partition"].values()) == snap["rows_in"]


def test_resume_idempotent_with_duplicate_turns(spark, tmppath):
    """Replayed (restart) turns collapse via dedup_turns before the kernel —
    final table identical, no duplicate (conv_id, session_id) rows."""
    tr = normalize_turns(synth_transcripts(spark, n_convs=15, turns_mean=12, hot_factor=3))
    replayed = tr.unionByName(tr.limit(50))  # partial re-ingest after restart
    clean = dedup_turns(replayed)
    a = sessionize_and_extract_fast(tr, 1800.0, rounding="r6")
    b = sessionize_and_extract_fast(clean, 1800.0, rounding="r6")
    rows_a = {(r["conv_id"], r["session_id"]): r["n_turns"] for r in a.collect()}
    rows_b = {(r["conv_id"], r["session_id"]): r["n_turns"] for r in b.collect()}
    assert rows_a == rows_b
    assert b.groupBy("conv_id", "session_id").count().filter(F.col("count") > 1).count() == 0


def test_compact_table(spark, tmp_path):
    """Small-files compaction: many tiny files -> few, same rows, safe swap."""
    from flow_feature_spark.io import compact_table

    path = f"{tmp_path}/frag"
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(40).write.parquet(path)
    before = spark.read.parquet(path)
    n_rows = before.count()

    stats = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40
    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert sorted(r["id"] for r in after.collect()) == list(range(10_000))
    # no leftover staging dirs
    import os
    leftovers = [d for d in os.listdir(tmp_path) if "compact" in d or "precompact" in d]
    assert leftovers == []


def test_compact_table_sorted(spark, tmp_path):
    from flow_feature_spark.io import compact_table

    path = f"{tmp_path}/frag2"
    spark.range(5_000).selectExpr("id", "id % 13 AS k").repartition(25).write.parquet(path)
    stats = compact_table(spark, path, target_file_bytes=512 * 1024 * 1024, sort_cols=("k", "id"))
    assert stats["files_after"] == 1
    got = [r["id"] for r in spark.read.parquet(path).collect()]
    assert sorted(got) == list(range(5_000))
