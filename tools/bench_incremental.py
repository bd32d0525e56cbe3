"""Incremental feature maintenance at ~30M turns (S7 scale evidence).

Three ways to bring the feature table up to date after a delta touching ~1%
of conversations (a recent cohort — the daily-pipeline shape), measured in
one JVM on the same input:

  A. full recompute + overwrite commit      — the no-S7 alternative
  B. incremental, plain copy-on-write       — recompute only touched convs,
     but rewrite the whole feature table (the COW floor)
  C. incremental, partition-bounded replace — feature table range-bucketed
     by conv cohort; only touched buckets rewritten, readers shadow them in
     older directories (replace_groups_partitioned)

Equality: every variant's final table must match variant A by row count and
exact bigint checksums (sum n_turns, sum round6(dpl_total)*1e6); a mismatch
fails the run. The delta: the LAST 1% of conversations (by id — synth conv
index correlates with arrival time like production ids) lose their tail
turns (turn_idx > 80% of mean) to the delta.

Appends results to BENCH/INCREMENTAL.md.

Usage: python tools/bench_incremental.py [n_convs] [turns_mean]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from harness import append_bench, timed, tool_spark, utc_stamp

N_BUCKETS = 256


def checksum(df):
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_turns").cast("bigint").alias("st"),
        F.sum((F.col("dpl_total") * 1e6).cast("bigint")).alias("sd"),
    ).collect()[0]
    return int(r["n"]), int(r["st"]), int(r["sd"])


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    turns_mean = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    gap_s = 1800.0

    from pyspark.sql import functions as F

    from flow_feature_spark.features import session_features_exact_sql
    from flow_feature_spark.incremental import TURN_COLS, incremental_feature_update
    from flow_feature_spark.io import (
        read_snapshot,
        snapshot_history,
        write_snapshot,
    )
    from flow_feature_spark.prepare import normalize_turns
    from flow_feature_spark.synth import synth_transcripts

    spark = tool_spark("bench_incremental")
    root = tempfile.mkdtemp(prefix="ffs_incr_bench_", dir="/dev/shm")
    try:
        turns_path = f"{root}/turns"
        normalize_turns(
            synth_transcripts(
                spark, n_convs=n_convs, turns_mean=turns_mean, hot_factor=100
            )
        ).select(*TURN_COLS).write.parquet(turns_path)
        turns = spark.read.parquet(turns_path)
        n_rows = turns.count()

        # delta: the LAST 1% of convs (recent cohort) lose their tail turns
        cidx = F.substring("conv_id", 5, 8).cast("int")
        touched_pred = cidx >= int(n_convs * 0.99)
        tail_pred = F.col("turn_idx") > int(turns_mean * 0.8)
        delta = turns.filter(touched_pred & tail_pred)
        base = turns.filter(~(touched_pred & tail_pred))
        d_rows = delta.count()
        d_convs = delta.select("conv_id").distinct().count()

        # variant A: full recompute + overwrite commit
        full_t = f"{root}/full_tbl"
        t_full, _ = timed(
            lambda: write_snapshot(
                session_features_exact_sql(turns, gap_s), full_t, job="bench"
            )
        )
        want = checksum(read_snapshot(spark, full_t))

        step = max(1, (n_convs + N_BUCKETS - 1) // N_BUCKETS)
        variants = [
            ("plain COW", {}),
            (
                f"range-bucketed x{N_BUCKETS}",
                {"feature_bucket_expr":
                 f"cast(substring(conv_id, 5, 8) AS int) DIV {step}"},
            ),
        ]
        lines = [
            f"| full recompute + overwrite commit | {t_full:.1f} | — | — |"
        ]
        results = {}
        for i, (label, kw) in enumerate(variants):
            tt, ft = f"{root}/turns_tbl{i}", f"{root}/feats_tbl{i}"
            t_init, _ = timed(
                lambda: incremental_feature_update(base, tt, ft, gap_s, **kw)
            )
            t_incr, st = timed(
                lambda: incremental_feature_update(delta, tt, ft, gap_s, **kw)
            )
            got = checksum(read_snapshot(spark, ft).drop("__bucket"))
            ok = got == want
            e = snapshot_history(spark, ft)[-1]
            parts = (
                f"{len(e.get('replaced_partitions', []))}/{N_BUCKETS} buckets"
                if e.get("replaced_partitions") is not None
                else "whole table"
            )
            lines.append(
                f"| incremental, {label} | {t_incr:.1f} | "
                f"{e['rows']:,} rows ({parts}) | "
                f"{'MATCH' if ok else 'MISMATCH'} |"
            )
            results[label] = (t_init, t_incr, ok, st)
            print(f"{label}: init={t_init:.1f}s incr={t_incr:.1f}s ok={ok}")
            if not ok:
                return 1

        t_plain = results["plain COW"][1]
        t_bound = results[f"range-bucketed x{N_BUCKETS}"][1]
        section = f"""
## {utc_stamp()} — {n_rows:,} turns, {n_convs:,} convs (hot 100x), local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]

Delta: {d_rows:,} turns ({d_rows / n_rows:.2%} of rows) across {d_convs:,} convs
({d_convs / n_convs:.2%} of convs, recent cohort).

| update path | wall s | commit writes | equality vs full |
|---|---|---|---|
{chr(10).join(lines)}

Full recompute {t_full:.1f} s vs plain-COW incremental {t_plain:.1f} s vs
partition-bounded incremental **{t_bound:.1f} s** ({t_full / t_bound:.1f}x vs full,
{t_plain / t_bound:.1f}x vs plain COW). The plain path proves the COW floor —
compute scoped to 1% of convs but the whole feature table rewritten; the
bounded path rewrites only the touched cohort buckets and shadows them in
older dirs (read amplification grows per replace commit; a periodic plain
replace is the compaction). Hash bucketing would NOT bound this delta
({d_convs:,} random convs hit ~min(k, N) buckets) — locality comes from the
cohort/range bucket expression.
"""
        append_bench(
            "INCREMENTAL.md", section,
            title="BENCH — incremental feature maintenance vs full recompute",
        )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
