"""Profiler exact-vs-HLL at scale (VERDICT r3 item 6).

profile_table's 10^12-row story: multiple exact COUNT(DISTINCT) columns plan
ONE scan + an Expand that duplicates every input row once per distinct
column inside the aggregate — still one pass over storage, but the aggregate
processes n_distinct_cols x n_rows rows. ``exact_distinct=False`` swaps in
HLL sketches (approx_count_distinct), which drop the Expand entirely. This
tool builds a 29.7M-row, 6-column table (3 distinct-bearing columns of very
different cardinalities), times both paths, asserts the plan shapes, and
reports the HLL error. Appends to BENCH/PROFILE_SCALE.md.

Usage: python tools/bench_profile_scale.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

from harness import append_bench, tool_spark, utc_stamp


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 29_700_000

    from pyspark.sql import functions as F

    from flow_feature_spark.profile import profile_table

    spark = tool_spark("profile_scale", cpus=32)
    df = (
        spark.range(n_rows)
        .select(
            F.col("id"),
            F.concat(F.lit("u"), (F.col("id") % 250_000).cast("string")).alias(
                "user_id"
            ),
            (F.col("id") % 97).cast("int").alias("shard"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 1_000
            ).alias("ts"),
            F.pmod(F.xxhash64("id"), F.lit(10_000_000)).alias("payload"),
            F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(2)), 31).cast(
                "string"
            )).alias("tag"),
        )
        .persist()
    )
    df.count()  # materialize the input so both paths time the AGGREGATE

    def run(exact: bool):
        prof = profile_table(df, exact_distinct=exact)
        plan = prof._jdf.queryExecution().executedPlan().toString()
        t0 = time.time()
        rows = {r["col"]: r for r in prof.collect()}
        return time.time() - t0, "Expand" in plan, rows

    # warm both codegen paths once, then measure best-of-2
    for exact in (True, False):
        run(exact)
    exact_t = min(run(True)[0] for _ in range(2))
    t, expand_exact, exact_rows = run(True)
    exact_t = min(exact_t, t)
    hll_t, expand_hll, hll_rows = run(False)
    t2, _, _ = run(False)
    hll_t = min(hll_t, t2)

    assert expand_exact, "exact multi-distinct plan must contain an Expand"
    assert not expand_hll, "HLL plan must NOT contain an Expand"

    errs = {
        c: abs(hll_rows[c]["n_distinct"] - exact_rows[c]["n_distinct"])
        / max(exact_rows[c]["n_distinct"], 1)
        for c in exact_rows
    }
    out = {
        "n_rows": n_rows,
        "exact_s": round(exact_t, 2),
        "hll_s": round(hll_t, 2),
        "speedup": round(exact_t / hll_t, 2),
        "expand_exact": expand_exact,
        "expand_hll": expand_hll,
        "max_hll_rel_err": round(max(errs.values()), 4),
    }
    print("RESULT " + json.dumps(out))

    stamp = utc_stamp()
    append_bench("PROFILE_SCALE.md", f"""
## {n_rows:,} rows x 6 columns (cached input, local[32]) — {stamp}

| path | plan | wall (best of 3) |
|---|---|---|
| exact COUNT(DISTINCT) x6 | one scan + **Expand** (input x distinct-cols inside the aggregate) | {out['exact_s']}s |
| approx_count_distinct x6 | one scan, **no Expand** | {out['hll_s']}s |

Speedup {out['speedup']}x; max HLL relative error across columns
{out['max_hll_rel_err']:.2%} (cardinalities 31 .. {n_rows:,}). The sketch
path is the 10^12-row default — plan shapes asserted here and in
tests/test_job_cli.py::test_profile_hll_path_drops_expand.
""", title="Profiler exact vs HLL at scale")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
