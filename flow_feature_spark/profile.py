"""Schema-driven table profiler (ingest QA for arbitrary tables).

One row per column: count, null count, exact distinct count, and typed
min/max — numerics as doubles, timestamps as epoch seconds, strings
lexicographic. The plan is a UNION ALL of per-column aggregate branches
over a SHARED scan: each branch is a partial+final hash aggregate with no
shuffle of raw rows, so the whole profile costs one pass over the table
per branch-group at any scale. Exact distincts follow the reference's
dst_sets discipline (flow.py:508-510); swap ``exact_distinct=False`` for
the HLL sketch when profiling 10^12-row tables where a ±2% distinct count
is acceptable.

The events-specific SQL twin (oracle_queries.table_profile_sql) pins this
shape against DuckDB hash-exactly; this module is the generic engine API
the job CLI exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Profile every column of ``df`` by its schema type."""
    branches = []
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    for field in df.schema.fields:
        c = F.col(f"`{field.name}`")
        dt = field.dataType
        if isinstance(dt, T.NumericType):
            mn = F.min(c).cast("double")
            mx = F.max(c).cast("double")
            smn = F.lit(None).cast("string")
            smx = F.lit(None).cast("string")
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            mn = F.unix_micros(F.min(c).cast("timestamp")) / F.lit(1e6)
            mx = F.unix_micros(F.max(c).cast("timestamp")) / F.lit(1e6)
            smn = F.lit(None).cast("string")
            smx = F.lit(None).cast("string")
        elif isinstance(dt, T.StringType):
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
            smn = F.min(c)
            smx = F.max(c)
        else:
            # binary / array / map / struct: cardinality only — an ordering
            # over these is not meaningful for QA
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
            smn = F.lit(None).cast("string")
            smx = F.lit(None).cast("string")
        branches.append(
            df.agg(
                F.lit(field.name).alias("col"),
                F.lit(dt.simpleString()).alias("dtype"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias("n_null"),
                distinct(c).cast("bigint").alias("n_distinct"),
                mn.alias("min_num"),
                mx.alias("max_num"),
                smn.alias("min_str"),
                smx.alias("max_str"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
