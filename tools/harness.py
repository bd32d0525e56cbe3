"""Shared harness for the tools/ bench scripts.

Every bench_* script repeats the same four blocks: repo-root sys.path
bootstrap, a get_spark wrapper, a best-of-N timing loop, and an
append-a-markdown-section-to-BENCH/<file> writer. This module owns them so
each tool is only its workload. Importing the module performs the sys.path
bootstrap (the one intentional side effect), so a tool's whole preamble is

    from tools.harness import tool_spark, best_of, append_bench
    ...          # or, run as a script:  import harness

Nothing here is production-engine code; flow_feature_spark must never
import from tools/.
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, "BENCH")


def tool_spark(app_name: str, cpus: int | None = None,
               shuffle_partitions: int | None = None,
               extra_conf: dict[str, str] | None = None):
    """get_spark with the tools' conventions: explicit local[cpus] master
    (default SPARK_GRAFT_CPUS or 32), shuffle partitions = cores unless
    overridden."""
    from flow_feature_spark.session import get_spark

    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        app_name=app_name,
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions or cpus,
        extra_conf=extra_conf,
    )


def best_of(fn, n: int = 3) -> tuple[float, object]:
    """Run fn() n times; return (best wall seconds, last return value).
    Minima, not medians: on this co-tenant VM a stolen scheduler window
    inflates a run multiplicatively, so the minimum is the least-polluted
    estimate of the true cost (BENCH/BASELINE.md protocol)."""
    best, result = float("inf"), None
    for _ in range(n):
        t0 = time.perf_counter()
        result = fn()
        best = min(best, time.perf_counter() - t0)
    return best, result


def timed(fn) -> tuple[float, object]:
    """Single timed run: (wall seconds, return value)."""
    t0 = time.perf_counter()
    result = fn()
    return time.perf_counter() - t0, result


def max_task_rows(df) -> tuple[int, int]:
    """(rows in the fattest task, number of non-empty tasks) for the plan as
    physically executed — the shuffle-skew observable every scale smoke
    reports. Materializes the frame once."""
    from pyspark.sql import functions as F

    per = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("n"))
        .collect()[0]
    )
    return int(per["mx"]), int(per["n"])


def utc_stamp() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")


def append_bench(filename: str, text: str, title: str | None = None) -> str:
    """Append a section to BENCH/<filename>, creating the file with a
    top-level title when absent. Returns the path written."""
    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, filename)
    if not os.path.exists(path) and title:
        with open(path, "w") as fh:
            fh.write(f"# {title}\n")
    with open(path, "a") as fh:
        fh.write(text if text.endswith("\n") else text + "\n")
    print(f"wrote {path}")
    return path


def run_worker(code: str, *argv: str):
    """Run a self-contained Spark workload in its OWN JVM (fresh subprocess)
    and parse the last JSON line it prints. Per-level fresh JVMs are the
    BASELINE.md scaling protocol — JIT/codegen caches must not leak between
    parallelism levels."""
    import json
    import subprocess

    out = subprocess.run(
        [sys.executable, "-c", code, *argv],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
        raise RuntimeError(f"worker failed rc={out.returncode}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)
