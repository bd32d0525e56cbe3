"""Per-query deep measurement: 5 runs (median + min) in ONE dedicated JVM,
plus the formatted physical plan, appended to BENCH/QUERY_DETAIL.md.

VERDICT r2 item 3: broadcast_join jumped 1.11 -> 2.94 s in round 2 with only
an output-expression change — decide between a real plan regression and the
documented co-tenant steal (BENCH/BASELINE.md measured up to 12x run
inflation on this VM). Median vs min separates the two: a plan regression
moves the MIN; steal moves the median while the min stays put.

Usage: python tools/bench_query_detail.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from harness import append_bench, tool_spark, utc_stamp


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args or ["broadcast_join", "minhash_lsh_pairs", "simhash_docs"]

    import __spark_entry__ as entrymod

    spark = tool_spark("bench_query_detail", cpus=32)
    qmap = entrymod.queries()

    stamp = utc_stamp()
    md = [f"", f"## Query detail ({stamp}) — {sf_dir}, local[32], $BENCH_RUNS (default 5) runs + warm-up", "",
          "| query | min s | median s | runs |", "|---|---|---|---|"]
    plans = []
    for name in names:
        df = qmap[name](spark, sf_dir)
        df.count()  # warm-up (codegen, broadcast build, file listing)
        runs = []
        for _ in range(int(os.environ.get("BENCH_RUNS", "5"))):
            t0 = time.time()
            qmap[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        md.append(
            f"| {name} | {min(runs)} | {statistics.median(runs)} | {runs} |"
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        # keep the operator tree, drop the verbose per-node detail blocks
        tree = plan.split("\n\n")[0]
        plans.append(f"### {name}\n\n```\n{tree}\n```\n")
    spark.stop()

    md += ["", *plans]
    append_bench("QUERY_DETAIL.md", "\n".join(md))
    print("\n".join(md[:12]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
