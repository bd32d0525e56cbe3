"""Dump .explain("formatted") for named declared queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] query [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query — the before/after
plan evidence the optimization rounds commit alongside the code.
"""

from __future__ import annotations

import os
import sys

from harness import REPO, tool_spark


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    args = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    import __spark_entry__ as entrymod

    spark = tool_spark("dump_plans", cpus=8, shuffle_partitions=16)
    qmap = entrymod.queries()
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in args:
        df = qmap[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — explain('formatted')\n\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
