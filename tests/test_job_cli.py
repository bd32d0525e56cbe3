"""spark-submit job surface (S5/S6): argparse -> engines -> sinks -> resume.

Runs job.run() in-process against the session fixture's JVM (get_spark reuses
the active session), small synthetic inputs.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from flow_feature_spark import job
from flow_feature_spark.synth import synth_transcripts


def _write_input(spark, path, n_convs=20):
    synth_transcripts(spark, n_convs=n_convs, turns_mean=10).write.mode(
        "overwrite"
    ).parquet(path)


def test_job_features_parquet(spark, tmp_path):
    inp, out = f"{tmp_path}/in", f"{tmp_path}/out"
    _write_input(spark, inp)
    assert job.run(["--input", inp, "--output", out]) == 0
    got = spark.read.parquet(out)
    assert got.count() > 15
    assert "fiat_mean" in got.columns and "feature_ts" in got.columns


def test_job_per_source_mode(spark, tmp_path):
    """--per-source: one feature row per input FILE (reference pcap mode)."""
    inp, out = f"{tmp_path}/in", f"{tmp_path}/out"
    base = synth_transcripts(spark, n_convs=12, turns_mean=10)
    cidx = F.substring("conv_id", 5, 8).cast("int")
    for shard in range(3):
        base.filter(cidx % 3 == shard).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{inp}/shard{shard}.parquet")
    assert job.run(
        ["--input", f"{inp}/shard*.parquet", "--output", out, "--per-source"]
    ) == 0
    got = spark.read.parquet(out)
    rows = got.select("source").collect()
    assert got.count() == 3  # one flow per shard file
    assert all(r["source"].startswith("part-") for r in rows)


def test_job_csv_header_sink(spark, tmp_path):
    inp, out = f"{tmp_path}/in", f"{tmp_path}/out"
    _write_input(spark, inp)
    assert job.run([
        "--input", inp, "--output", out, "--format", "csv", "--csv-header",
    ]) == 0
    files = glob.glob(f"{out}/*.csv")
    assert files
    with open(files[0]) as fh:
        header = fh.readline()
    assert "fiat_mean" in header and "duration" in header


def test_job_checkpoint_fingerprint_covers_flags(spark, tmp_path):
    """Rerunning with a changed semantics flag must RECOMPUTE, not resume."""
    inp, out, ckpt = f"{tmp_path}/in", f"{tmp_path}/out", f"{tmp_path}/ckpt"
    _write_input(spark, inp)
    assert job.run(["--input", inp, "--output", out, "--checkpoint", ckpt]) == 0
    m1 = json.load(open(os.path.join(ckpt, "_FFS_MANIFEST.json")))
    # same flags -> resume (manifest untouched)
    assert job.run(["--input", inp, "--output", out, "--checkpoint", ckpt]) == 0
    m2 = json.load(open(os.path.join(ckpt, "_FFS_MANIFEST.json")))
    assert m2["written_at"] == m1["written_at"]
    # changed rounding -> fingerprint differs -> recompute (manifest rewritten)
    assert job.run([
        "--input", inp, "--output", out, "--checkpoint", ckpt, "--rounding", "r6",
    ]) == 0
    m3 = json.load(open(os.path.join(ckpt, "_FFS_MANIFEST.json")))
    assert m3["input_fingerprint"] != m1["input_fingerprint"]
