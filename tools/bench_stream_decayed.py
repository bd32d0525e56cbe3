"""stream_decayed_counts at ~30M replayed events: throughput of the
stateful streaming half-life engine and the boundedness of its state.

Replays the bench_timeseries synthetic stream (hot user x100) through
maxFilesPerTrigger-staged micro-batches plus two far-future advancer events,
and reports wall-clock, output grid rows (must equal the batch grid count),
rows/s, and the PEAK state memory from the query's progress stream — the
structural claim being that state is O(entities * (lookback + in-flight
buckets)), never the event stream.

Usage: python tools/bench_stream_decayed.py [n_events] [hot_factor] [chunks]
Appends to BENCH/TIMESERIES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from harness import append_bench, tool_spark, utc_stamp

BUCKET_US = 21_600_000_000
K = 20


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 29_700_000
    hot_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from bench_timeseries import build_events

    from pyspark.sql import functions as F

    from flow_feature_spark.streaming import stream_decayed_counts
    from flow_feature_spark.timeseries import resample_counts, decayed_counts

    spark = tool_spark("bench_stream_decayed")
    ev = build_events(spark, n_events, hot_factor).select(
        "user_id", F.timestamp_micros("ts_us").alias("ts"), "ts_us"
    )
    base = "/dev/shm/bench_sdecay"
    os.system(f"rm -rf {base} {base}_out {base}_ckpt")
    lo_us, max_us = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    # data in `chunks` TIME-RANGE micro-batches (a replay must be event-time
    # ordered: with a 0s watermark delay, hash-chunking would deliver rows
    # below the previous chunk's max event time and the stateful late-row
    # filter would drop them), then two advancers
    span = max_us - lo_us + 1
    cix = F.floor((F.col("ts_us") - F.lit(lo_us)) * chunks / F.lit(span))
    parts = [ev.filter(cix == i) for i in range(chunks)]
    advancers = [
        spark.createDataFrame([(-1, max_us + off)], "user_id long, ts_us long")
        .select("user_id", F.timestamp_micros("ts_us").alias("ts"), "ts_us")
        for off in (2 * BUCKET_US, 4 * BUCKET_US)
    ]
    for i, df in enumerate(parts + advancers):
        sub = f"{base}/batch{i}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        stamp = time.time() + i * 10
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))

    schema = spark.read.parquet(f"{base}/batch0").schema
    stream = (
        spark.readStream.schema(schema)
        # ONE file per trigger: the two advancers must be SEPARATE triggers
        # (the first pushes the watermark past all data, the second is the
        # trigger in which the armed EventTimeTimeouts actually fire) —
        # bundling them starves the tail flush of its firing trigger
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/batch*")
    )
    t0 = time.perf_counter()
    q = (
        stream_decayed_counts(stream, "user_id", "ts", BUCKET_US, lookback=K)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{base}_out")
        .option("checkpointLocation", f"{base}_ckpt")
        .start()
    )
    peak_state = 0
    try:
        q.processAllAvailable()
        for prog in q.recentProgress:
            for op in prog.get("stateOperators", []):
                peak_state = max(
                    peak_state,
                    op.get("customMetrics", {}).get("stateOnCurrentVersionSizeBytes",
                                                    op.get("memoryUsedBytes", 0)),
                )
    finally:
        q.stop()
    wall = time.perf_counter() - t0

    out_rows = spark.read.parquet(f"{base}_out").filter("user_id >= 0").count()
    grid_rows = decayed_counts(
        resample_counts(ev.select("user_id", "ts_us"), "user_id", "ts_us",
                        BUCKET_US),
        "user_id", "bucket_idx", "n_events", lookback=K,
    ).count()

    res = {
        "n_events": n_events, "hot_factor": hot_factor, "chunks": chunks,
        "wall_sec": round(wall, 1),
        "events_per_sec": round(n_events / wall),
        "out_grid_rows": out_rows,
        "batch_grid_rows": grid_rows,
        "grid_match": out_rows == grid_rows,
        "peak_state_bytes": int(peak_state),
    }
    print(json.dumps(res, indent=2))
    append_bench(
        "TIMESERIES.md",
        f"\n## {utc_stamp()} — stream_decayed_counts replay, local[32]\n\n"
        f"```json\n{json.dumps(res, indent=2)}\n```\n",
    )
    return 0 if res["grid_match"] else 1


if __name__ == "__main__":
    sys.exit(main())
