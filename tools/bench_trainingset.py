"""Training-set builder at scale: 3 feature groups × 29.7M turns × 2.5M probes.

What the J8 scale story must show: each feature group costs ONE window
pass over the (probes ∪ group) union — wall-clock grows linearly in the
group count, and the hot entity (hot_factor=100) bounds the fattest task,
the builder's skew surface (the same per-entity partitioning every as-of
pass uses). Reports per-stage wall, output rows, and max task rows under
the hot key.

Run: python tools/bench_trainingset.py [n_convs] [turns_mean]
Appends to BENCH/SEQUENCE_SCALE.md.
"""

from __future__ import annotations

import sys
import tempfile
import time

from harness import append_bench, max_task_rows, tool_spark, utc_stamp


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    turns_mean = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = tool_spark("bench_trainingset")

    from pyspark.sql import functions as F

    from flow_feature_spark.featurestore import (
        FeatureGroup,
        attach_future_labels,
        build_training_set,
    )
    from flow_feature_spark.prepare import normalize_turns
    from flow_feature_spark.synth import synth_probes, synth_transcripts

    base = tempfile.mkdtemp(prefix="ffs_bench_ts_")
    tpath = f"{base}/turns"
    synth_transcripts(
        spark, n_convs=n_convs, turns_mean=turns_mean, hot_factor=100
    ).write.parquet(tpath)
    turns = normalize_turns(spark.read.parquet(tpath))
    n_turns = turns.count()
    probes = synth_probes(spark, n_convs=n_convs, probes_per_entity=5)

    # three independently-cadenced groups, all real engine shapes
    g_session = (
        turns.groupBy("conv_id")
        .agg(
            F.max("ts_us").alias("a_us"),
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("plen").alias("plen_sum"),
        )
        .select(
            "conv_id", F.timestamp_micros("a_us").alias("feature_ts"),
            "n_turns", "plen_sum",
        )
    )
    g_day = (
        turns.groupBy(
            "conv_id",
            F.floor(F.col("ts_us") / F.lit(86400000000.0)).alias("__d"),
        )
        .agg(F.max("ts_us").alias("a_us"), F.count(F.lit(1)).alias("n_day"))
        .select("conv_id", F.timestamp_micros("a_us").alias("feature_ts"), "n_day")
    )
    g_roll = attach_future_labels(
        turns.select("conv_id", "ts_us", "win"), 3600.0, value_col="win"
    ).select(
        "conv_id", F.timestamp_micros("ts_us").alias("feature_ts"),
        F.col("label_n").alias("next_hr_turns"),
    )

    lines = [
        f"\n## {utc_stamp()} — training-set builder, {n_turns:,} turns, "
        f"{probes.count():,} probes, hot_factor=100\n",
        "| stage | wall | rows | max task rows |",
        "|---|---|---|---|",
    ]
    groups: dict = {}
    prev = None
    for name, g in [("sess", g_session), ("day", g_day), ("roll", g_roll)]:
        groups[name] = FeatureGroup(g)
        t0 = time.time()
        ts = build_training_set(probes, groups)
        mx, _ = max_task_rows(ts)
        dt = time.time() - t0
        n_out = ts.count()
        lines.append(
            f"| +{name} ({len(groups)} group{'s' if len(groups) > 1 else ''}) "
            f"| {dt:.1f}s | {n_out:,} | {mx:,} |"
        )
        if prev is not None and n_out != prev:
            raise AssertionError("probe row count changed across groups")
        prev = n_out
    lines.append(
        "\nEach added group costs one more union+window pass over the probe "
        "frame — the linear-in-groups cost shape a feature store pays. The "
        "hot entity's partition bounds the fattest task; probe rows never "
        "change count (no join fan-out, NULL vectors for unseen entities)."
    )
    append_bench("SEQUENCE_SCALE.md", "\n".join(lines))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
