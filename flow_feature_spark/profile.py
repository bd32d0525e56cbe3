"""Schema-driven table profiler (ingest QA for arbitrary tables).

One row per column: count, null count, exact distinct count, and typed
min/max — numerics as doubles, timestamps as epoch seconds, strings
lexicographic. All columns' statistics are computed in ONE aggregate over
ONE scan (Catalyst does NOT deduplicate identical scans across UNION ALL
branches, so the per-column-branch formulation would rescan the table once
per column — a non-starter at 100 TB); the single wide aggregate row is
then unpivoted to long form with ``stack``. Multiple exact COUNT(DISTINCT)
columns plan as one scan + an Expand (the input duplicated once per
distinct column inside the aggregate) — still one pass over storage; pass
``exact_distinct=False`` to swap in HLL sketches, which drop the Expand
entirely for 10^12-row tables where ±2% distinct counts are acceptable.
Exact distincts follow the reference's dst_sets discipline
(flow.py:508-510).

The events-specific SQL twin (oracle_queries.table_profile_sql) pins this
shape against DuckDB hash-exactly; this module is the generic engine API
the job CLI exposes (tested equal to the SQL twin on the events table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _typed_minmax(c: Column, dt: T.DataType) -> tuple[Column, Column, Column, Column]:
    """(min_num, max_num, min_str, max_str) for one column by type."""
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    if isinstance(dt, T.NumericType):
        return F.min(c).cast("double"), F.max(c).cast("double"), null_s, null_s
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return (
            F.unix_micros(F.min(c).cast("timestamp")) / F.lit(1e6),
            F.unix_micros(F.max(c).cast("timestamp")) / F.lit(1e6),
            null_s,
            null_s,
        )
    if isinstance(dt, T.StringType):
        return null_d, null_d, F.min(c), F.max(c)
    # binary / array / map / struct: cardinality only — an ordering over
    # these is not meaningful for QA
    return null_d, null_d, null_s, null_s


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Profile every column of ``df`` by its schema type, in one scan."""
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs: list[Column] = []
    for i, field in enumerate(df.schema.fields):
        c = F.col(f"`{field.name}`")
        # Spark cannot hash/group MapType values, so COUNT(DISTINCT map_col)
        # throws AnalysisException — count distinct over the key-sorted entry
        # array instead (array<struct> IS hashable, and sorting makes
        # logically-equal maps compare equal regardless of insertion order),
        # preserving the "cardinality only" contract for arbitrary schemas
        dc = (
            F.array_sort(F.map_entries(c))
            if isinstance(field.dataType, T.MapType)
            else c
        )
        mn, mx, smn, smx = _typed_minmax(c, field.dataType)
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"_n_{i}"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"_nn_{i}"),
            distinct(dc).cast("bigint").alias(f"_nd_{i}"),
            mn.cast("double").alias(f"_mn_{i}"),
            mx.cast("double").alias(f"_mx_{i}"),
            smn.alias(f"_smn_{i}"),
            smx.alias(f"_smx_{i}"),
        ]
    wide = df.agg(*aggs)
    n_cols = len(df.schema.fields)
    groups = []
    for i, field in enumerate(df.schema.fields):
        name = field.name.replace("'", "\\'")
        dtype = field.dataType.simpleString().replace("'", "\\'")
        groups.append(
            f"'{name}', '{dtype}', _n_{i}, _nn_{i}, _nd_{i}, "
            f"_mn_{i}, _mx_{i}, _smn_{i}, _smx_{i}"
        )
    return wide.selectExpr(
        f"stack({n_cols}, {', '.join(groups)}) AS "
        "(col, dtype, n, n_null, n_distinct, min_num, max_num, min_str, max_str)"
    )
