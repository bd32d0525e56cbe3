"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir and diffs
it against the matching ``oracle_sql()`` via DuckDB: row count, column names,
dtypes, and order-insensitive exact value comparison (strictest plausible
driver hash). Exit code 1 if any query mismatches.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems: list[str] = []
    a, b = _canon(spark_df), _canon(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duckdb={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duckdb={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            both_nan = pd.isna(av) & pd.isna(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = np.flatnonzero(~eq)[:5]
                mx = np.nanmax(np.abs(av[~both_nan] - bv[~both_nan])) if (~both_nan).any() else 0
                problems.append(
                    f"col {c}: {len(np.flatnonzero(~eq))} exact mismatches, "
                    f"max|diff|={mx:.3e}, first idx={bad.tolist()}, "
                    f"spark={av[bad].tolist()} duck={bv[bad].tolist()}"
                )
        else:
            an, bn = pd.isna(av), pd.isna(bv)
            eq = (an & bn) | ((~an) & (~bn) & (av.astype(object) == bv.astype(object)))
            if not np.asarray(eq).all():
                bad = np.flatnonzero(~np.asarray(eq))[:5]
                problems.append(
                    f"col {c} ({a[c].dtype} vs {b[c].dtype}): mismatches at {bad.tolist()}: "
                    f"spark={av[bad].tolist()} duck={bv[bad].tolist()}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from harness import tool_spark  # bootstraps repo root onto sys.path

    import __spark_entry__ as entrymod

    spark = tool_spark("compare_oracle", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures += 1
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(os_[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"[FAIL] {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"[OK]   {name}: {len(sdf)} rows exact match ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
