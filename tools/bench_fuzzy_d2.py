"""Fuzzy edit-distance join at d=2 over 10^6 strings — DEFAULT CONFS ONLY.

Round-5 ops note (BENCH/TIMESERIES.md): the ~137M-variant d=2 self-join hit
AQE's post-explode size mis-estimate, got planned as a broadcast, and killed
the driver on spark.driver.maxResultSize; the round-5 run only completed with
a manual session-wide autoBroadcastJoinThreshold=-1. Round 6 moved the fix
into the operator (`ops/fuzzy.py`: spillable sort-merge pinned on the variant joins),
so this re-run deliberately uses a PLAIN tool_spark session — no conf
workaround — and succeeds iff the hint pins the physical strategy.

Expected exact output at the synthetic corpus (groups of 10 = 1 base + 9
single-substitution variants at distinct positions): per group, 9 base<->
variant pairs at d=1 plus 36 variant<->variant pairs at d=2 -> 45 pairs per
group, 4,500,000 total at 10^6 strings.

Usage: python tools/bench_fuzzy_d2.py [n_strings]
Appends to BENCH/TIMESERIES.md.
"""

from __future__ import annotations

import json
import sys
import time

from bench_timeseries import build_strings
from harness import append_bench, tool_spark, utc_stamp


def main() -> int:
    n_strings = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from flow_feature_spark.ops.fuzzy import edit_distance_pairs

    spark = tool_spark("bench_fuzzy_d2")
    sdf = build_strings(spark, n_strings)
    sdf.write.mode("overwrite").parquet("/dev/shm/bench_fuzzy_strings")
    stored = spark.read.parquet("/dev/shm/bench_fuzzy_strings")

    pairs = edit_distance_pairs(stored, "id", "s", max_distance=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, "hint failed to pin the strategy"
    assert "SortMergeJoin" in plan and "ShuffledHashJoin" not in plan

    t0 = time.time()
    n_pairs = pairs.count()
    wall = round(time.time() - t0, 1)
    expected = 45 * (n_strings // 10)
    out = {
        "n_strings": n_strings,
        "pairs": n_pairs,
        "expected_pairs": expected,
        "exact": n_pairs == expected,
        "wall_s": wall,
        "confs": "DEFAULT (no autoBroadcastJoinThreshold workaround)",
        "plan": "SortMergeJoin pinned, no BroadcastExchange",
    }
    print("RESULT " + json.dumps(out))
    append_bench(
        "TIMESERIES.md",
        f"\n## fuzzy d=2 re-run, default confs — {utc_stamp()}\n\n"
        f"The r5 d=2 driver-death is fixed IN CODE (`ops/fuzzy.py` sort-merge\n"
        f"pins): {n_strings:,} strings, d=2, plan asserted broadcast-free, "
        f"completed in {wall}s with {n_pairs:,} pairs "
        f"({'EXACT closed-form match' if out['exact'] else 'MISMATCH'}) — no "
        f"session conf workaround.\n",
        title="BENCH — time-series regularization + fuzzy join at scale",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
