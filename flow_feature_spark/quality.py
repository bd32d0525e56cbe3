"""Declarative data-quality expectations (training-data ingest gate).

Deequ-shaped: callers declare constraints — not-null, range, set membership,
LIKE shape, uniqueness, row count, arbitrary boolean SQL — and get back a
report DataFrame with one row per constraint: how many rows violate it and
whether it passed. The gate a 100-TB training pipeline runs between ingest
and feature extraction, next to the schema-driven profiler (profile.py).

Plan shape: ALL constraints are evaluated in ONE aggregate over ONE scan
(conditional sums, plus count/count-distinct pairs for uniqueness), and the
single wide row is unpivoted to the report with ``stack`` — the same
no-rescan discipline as profile_table. Uniqueness adds an Expand (one
duplicate of the aggregate input per distinct-key), still one pass over
storage. No collect: the report is a DataFrame, so the gate composes into
jobs (write it next to the output, join it, alert on it).

NULL discipline: value constraints (range / set / like / custom) treat NULL
as NOT violating — missingness is its own concern, declared explicitly with
``expect_not_null``. This keeps each constraint's count independent and the
cross-engine SQL twin trivial (`WHERE c IS NOT NULL AND NOT pred`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> dict:
    return {"kind": "not_null", "col": col, "detail": "is not null"}


def expect_in_range(col: str, lo, hi) -> dict:
    """lo <= col <= hi (inclusive both ends), NULLs exempt."""
    return {
        "kind": "in_range", "col": col, "lo": lo, "hi": hi,
        "detail": f"between {lo} and {hi}",
    }


def expect_in_set(col: str, values: list) -> dict:
    """col in values, NULLs exempt. ``values`` order is kept in the detail."""
    return {
        "kind": "in_set", "col": col, "values": list(values),
        "detail": "in (" + ", ".join(str(v) for v in values) + ")",
    }


def expect_like(col: str, pattern: str) -> dict:
    """SQL LIKE pattern (``%``/``_`` wildcards — portable across engines,
    unlike regex dialects), NULLs exempt."""
    return {"kind": "like", "col": col, "pattern": pattern,
            "detail": f"like '{pattern}'"}


def expect_unique(*cols: str) -> dict:
    """No two rows share the same non-NULL key tuple. Violations = the
    number of EXCESS rows (count of complete key tuples minus distinct key
    tuples): 0 when unique, k-1 for a key appearing k times."""
    return {"kind": "unique", "cols": list(cols),
            "detail": "unique(" + ", ".join(cols) + ")"}


def expect_row_count(min_rows: int) -> dict:
    """Table has at least ``min_rows`` rows; violations = the shortfall."""
    return {"kind": "row_count", "min_rows": int(min_rows),
            "detail": f"rows >= {int(min_rows)}"}


def expect_expr(name: str, predicate: str) -> dict:
    """Arbitrary boolean SQL over the row; a row violates when the
    predicate is non-NULL false (NULL is exempt, matching the value
    constraints)."""
    return {"kind": "expr", "col": name, "predicate": predicate,
            "detail": predicate}


def expectations_from_specs(specs: list[dict]) -> list[dict]:
    """Build expectations from plain JSON-able specs (the job CLI's
    ``--expectations`` file): [{"kind": "not_null", "col": "conv_id"},
    {"kind": "unique", "cols": [...]}, ...] — each kind routed through its
    constructor so detail strings stay canonical."""
    out = []
    for s in specs:
        k = s.get("kind")
        if k == "not_null":
            out.append(expect_not_null(s["col"]))
        elif k == "in_range":
            out.append(expect_in_range(s["col"], s["lo"], s["hi"]))
        elif k == "in_set":
            out.append(expect_in_set(s["col"], s["values"]))
        elif k == "like":
            out.append(expect_like(s["col"], s["pattern"]))
        elif k == "unique":
            out.append(expect_unique(*s["cols"]))
        elif k == "row_count":
            out.append(expect_row_count(s["min_rows"]))
        elif k == "expr":
            out.append(expect_expr(s["name"], s["predicate"]))
        else:
            raise ValueError(f"unknown expectation kind {k!r}")
    return out


def _violation(e: dict) -> Column:
    """Boolean column: this row violates constraint ``e``."""
    if e["kind"] == "not_null":
        return F.col(e["col"]).isNull()
    if e["kind"] == "in_range":
        c = F.col(e["col"])
        return c.isNotNull() & ~c.between(F.lit(e["lo"]), F.lit(e["hi"]))
    if e["kind"] == "in_set":
        c = F.col(e["col"])
        return c.isNotNull() & ~c.isin(e["values"])
    if e["kind"] == "like":
        c = F.col(e["col"])
        return c.isNotNull() & ~c.like(e["pattern"])
    if e["kind"] == "expr":
        p = F.expr(e["predicate"])
        return p.isNotNull() & ~p
    raise ValueError(f"unknown expectation kind {e['kind']!r}")


def check_expectations(df: DataFrame, expectations: list[dict]) -> DataFrame:
    """Evaluate all expectations in one scan; return the report DataFrame
    ``(check_name, column_name, detail, total, violations, passed)`` with
    one row per expectation, in declaration order (``check_idx`` ordering is
    encoded by the stack; sort on check_name/column_name for display)."""
    if not expectations:
        raise ValueError("no expectations declared")
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("__total")]
    for i, e in enumerate(expectations):
        if e["kind"] == "unique":
            cols = [F.col(c) for c in e["cols"]]
            complete = cols[0].isNotNull()
            for c in cols[1:]:
                complete = complete & c.isNotNull()
            aggs.append(
                F.count(F.when(complete, F.lit(1))).cast("bigint").alias(f"__k{i}")
            )
            aggs.append(F.countDistinct(*cols).cast("bigint").alias(f"__d{i}"))
        elif e["kind"] == "row_count":
            pass  # derived from __total
        else:
            aggs.append(
                F.sum(F.when(_violation(e), 1).otherwise(0))
                .cast("bigint")
                .alias(f"__v{i}")
            )
    wide = df.agg(*aggs)

    def lit(s: str) -> str:
        return "'" + s.replace("'", "\\'") + "'"

    groups = []
    for i, e in enumerate(expectations):
        col_name = e.get("col") or ", ".join(e.get("cols", [])) or "*"
        if e["kind"] == "unique":
            viol = f"__k{i} - __d{i}"
        elif e["kind"] == "row_count":
            col_name = "*"
            n = e["min_rows"]
            viol = f"CASE WHEN __total < {n} THEN {n} - __total ELSE 0 END"
        else:
            viol = f"__v{i}"
        groups.append(
            f"{lit(e['kind'])}, {lit(col_name)}, {lit(e['detail'])}, "
            f"__total, cast(({viol}) AS bigint)"
        )
    report = wide.selectExpr(
        f"stack({len(expectations)}, {', '.join(groups)}) AS "
        "(check_name, column_name, detail, total, violations)"
    )
    return report.withColumn("passed", F.col("violations") == 0)
