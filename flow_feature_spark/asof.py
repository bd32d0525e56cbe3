"""Point-in-time (as-of) join: attach the latest non-leaking feature vector to
every entity x timestamp probe (SURVEY.md §2.3 J1 — north-rule mandate; the
reference performs no joins).

Two independent strategies, cross-checked in tests:

* ``asof_join_union_window`` — pure Spark SQL: tag both sides, union, one
  window pass per entity ordered by (ts, side), ``last(payload,
  ignorenulls=True)``, keep probe rows. Strictness (`<` vs `<=`) is encoded in
  the tie order of the ``side`` column at equal timestamps. This is the
  SQL-expressible form used as the DuckDB oracle — AND the scale path: it
  never crosses the Arrow boundary, measured 8-13x faster than the Arrow
  strategy at 30M probes with 8->32-core scaling at ~0.98 of the hardware
  ceiling (BENCH/BASELINE.md). Paired with session_features_exact_sql the
  whole probe pipeline is JVM-only.
* ``asof_join_merge`` — cogrouped ``pd.merge_asof(...,
  allow_exact_matches=not strict)`` per entity bucket — readable, exact, but
  pays a Python call per entity.
* ``asof_join_fast`` — vectorized Arrow sort-merge: union both sides,
  ONE hash co-shuffle on entity + partition-local sort by (entity, ts, side),
  then a single vectorized forward-fill pass per Arrow batch
  (np.maximum.accumulate over feature-row indices) with one carried feature
  row across batch boundaries. No per-entity Python calls; the strategy for
  pipelines that continue in pandas (the whole 30M-row stream pays the Arrow
  socket once per side — per-executor on a cluster, but the dominant term on
  one host).

Zero-leakage contract (strict=True): a probe at ts T sees only features with
feature_ts strictly < T. Probes before any feature, and entities with no
feature rows at all, yield null feature columns (left semantics).

Max-staleness contract (``tolerance_seconds``): when set, a probe only
matches a feature with ``probe_ts - feature_ts <= tolerance`` — the standard
feature-store guard against serving stale state. Since the as-of match is
always the LATEST admissible feature, a too-old match means no admissible
feature exists, so the row nulls out (identical semantics in all three
strategies and the DuckDB oracle).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tol_us(tolerance_seconds: float | None) -> int | None:
    """Validated tolerance in µs — identical contract for all three strategies.

    A tolerance that rounds to 0 µs is rejected here (rather than letting
    pd.merge_asof raise its own 'tolerance must be positive' only on the
    merge strategy while the window strategies silently accept tol_us=0):
    strategy parity means the same inputs raise the same error everywhere.
    """
    if tolerance_seconds is None:
        return None
    tol_us = int(round(tolerance_seconds * 1e6))
    if tol_us < 1:
        raise ValueError(
            f"tolerance_seconds={tolerance_seconds} rounds to {tol_us} µs; "
            "must be >= 1 µs (or None for unbounded lookback)"
        )
    return tol_us


def _feature_value_cols(features: DataFrame, entity_col: str, ts_col: str) -> list[str]:
    return [c for c in features.columns if c not in (entity_col, ts_col)]


def asof_join_union_window(
    features: DataFrame,
    probes: DataFrame,
    feature_entity: str = "conv_id",
    feature_ts: str = "feature_ts",
    probe_entity: str = "entity_id",
    probe_ts: str = "probe_ts",
    strict: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Union-and-window as-of join. Returns probe rows + feature columns."""
    vals = _feature_value_cols(features, feature_entity, feature_ts)
    tol_us = _tol_us(tolerance_seconds)

    # side tie-break at equal ts: strict -> probe sorts BEFORE the feature row
    # (cannot see it); inclusive -> after.
    probe_side, feat_side = (0, 1) if strict else (1, 0)

    f = features.select(
        F.col(feature_entity).alias("__ent"),
        F.unix_micros(F.col(feature_ts).cast("timestamp")).alias("__t_us"),
        F.lit(feat_side).alias("__side"),
        F.struct(
            F.unix_micros(F.col(feature_ts).cast("timestamp")).alias("__ft_us"),
            *[F.col(c) for c in vals],
        ).alias("__payload"),
        F.lit(None).cast("timestamp").alias(probe_ts),
    )
    p = probes.select(
        F.col(probe_entity).alias("__ent"),
        F.unix_micros(F.col(probe_ts).cast("timestamp")).alias("__t_us"),
        F.lit(probe_side).alias("__side"),
        F.lit(None).cast(f.schema["__payload"].dataType).alias("__payload"),
        F.col(probe_ts),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__ent")
        .orderBy("__t_us", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        f.unionByName(p)
        .withColumn("__last", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == probe_side)
    )
    if tol_us is not None:
        fresh = (
            F.col("__last").isNotNull()
            & ((F.col("__t_us") - F.col("__last").getField("__ft_us")) <= tol_us)
        )
        joined = joined.withColumn(
            "__last", F.when(fresh, F.col("__last"))
        )
    return joined.select(
        F.col("__ent").alias(probe_entity),
        F.col(probe_ts),
        *[F.col("__last").getField(c).alias(c) for c in vals],
    )


def asof_join_merge(
    features: DataFrame,
    probes: DataFrame,
    feature_entity: str = "conv_id",
    feature_ts: str = "feature_ts",
    probe_entity: str = "entity_id",
    probe_ts: str = "probe_ts",
    strict: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Cogrouped sort-merge as-of join via ``pd.merge_asof`` (the fast path)."""
    vals = _feature_value_cols(features, feature_entity, feature_ts)
    tol_us = _tol_us(tolerance_seconds)

    out_fields = [
        T.StructField(probe_entity, T.StringType(), False),
        T.StructField(probe_ts, T.TimestampType(), False),
    ] + [
        T.StructField(c, features.schema[c].dataType, True) for c in vals
    ]
    out_schema = T.StructType(out_fields)

    # micros domain for exact tie semantics (timestamp columns arrive in
    # pandas as datetime64[ns]/[us]; int64 micros avoids unit drift).
    f = features.select(
        F.col(feature_entity).alias("__ent"),
        F.unix_micros(F.col(feature_ts).cast("timestamp")).alias("__t_us"),
        *vals,
    )
    p = probes.select(
        F.col(probe_entity).alias("__ent"),
        F.unix_micros(F.col(probe_ts).cast("timestamp")).alias("__t_us"),
    )
    allow_exact = not strict

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = probes of one entity bucket, right = features
        if left.empty:
            return pd.DataFrame(columns=[fld.name for fld in out_fields])
        left = left.sort_values("__t_us", kind="mergesort")
        right = right.sort_values("__t_us", kind="mergesort")
        merged = pd.merge_asof(
            left,
            right.drop(columns=["__ent"]),
            on="__t_us",
            allow_exact_matches=allow_exact,
            direction="backward",
            tolerance=tol_us,  # None -> unbounded lookback
        )
        merged[probe_entity] = merged["__ent"]
        merged[probe_ts] = pd.to_datetime(merged["__t_us"], unit="us")
        return merged[[probe_entity, probe_ts] + vals]

    return (
        p.groupBy("__ent")
        .cogroup(f.groupBy("__ent"))
        .applyInPandas(merge, schema=out_schema)
    )


def asof_join_fast(
    features: DataFrame,
    probes: DataFrame,
    feature_entity: str = "conv_id",
    feature_ts: str = "feature_ts",
    probe_entity: str = "entity_id",
    probe_ts: str = "probe_ts",
    strict: bool = True,
    num_partitions: int | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Vectorized distributed sort-merge as-of join (see module docstring)."""
    import numpy as np

    vals = _feature_value_cols(features, feature_entity, feature_ts)
    tol_us = _tol_us(tolerance_seconds)
    probe_side, feat_side = (0, 1) if strict else (1, 0)

    f = features.select(
        F.col(feature_entity).alias("__ent"),
        F.unix_micros(F.col(feature_ts).cast("timestamp")).alias("__t_us"),
        F.lit(feat_side).alias("__side"),
        *[F.col(c) for c in vals],
    )
    p = probes.select(
        F.col(probe_entity).alias("__ent"),
        F.unix_micros(F.col(probe_ts).cast("timestamp")).alias("__t_us"),
        F.lit(probe_side).alias("__side"),
        *[F.lit(None).cast(features.schema[c].dataType).alias(c) for c in vals],
    )
    u = f.unionByName(p)
    u = (
        u.repartition(num_partitions, "__ent") if num_partitions else u.repartition("__ent")
    ).sortWithinPartitions("__ent", "__t_us", "__side")

    out_fields = [
        T.StructField(probe_entity, T.StringType(), False),
        T.StructField(probe_ts, T.TimestampType(), False),
    ] + [T.StructField(c, features.schema[c].dataType, True) for c in vals]
    out_schema = T.StructType(out_fields)

    is_probe_side = probe_side

    def run(batches):
        carry: pd.DataFrame | None = None  # exactly one feature row, or None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            n = len(pdf)
            if n == 0:
                continue
            ent = pdf["__ent"].to_numpy()
            ent_codes = pd.factorize(ent)[0]  # C-speed, avoids object compares
            side = pdf["__side"].to_numpy()
            is_feat = side != is_probe_side
            idx = np.arange(n)
            last_feat = np.maximum.accumulate(np.where(is_feat, idx, -1))
            probe_rows = np.flatnonzero(~is_feat)
            if len(probe_rows):
                src = last_feat[probe_rows]
                ok = src >= 0
                ok[ok] = ent_codes[src[ok]] == ent_codes[probe_rows[ok]]
                if tol_us is not None:
                    t_arr = pdf["__t_us"].to_numpy()
                    ok[ok] = (
                        t_arr[probe_rows[ok]] - t_arr[src[ok]]
                    ) <= tol_us
                out = pd.DataFrame(
                    {
                        probe_entity: ent[probe_rows],
                        probe_ts: pd.to_datetime(
                            pdf["__t_us"].to_numpy()[probe_rows], unit="us"
                        ),
                    }
                )
                for c in vals:
                    col = pdf[c].to_numpy()
                    taken = col[np.where(ok, src, 0)]
                    taken = pd.Series(taken).where(ok)
                    out[c] = taken
                yield out
            # carry the most recent feature row of the final entity
            feats_of_last = np.flatnonzero(is_feat & (ent_codes == ent_codes[-1]))
            if len(feats_of_last):
                carry = pdf.iloc[[feats_of_last[-1]]]
            else:
                carry = pdf.iloc[[0]].iloc[0:0] if carry is None else carry.iloc[0:0]
        return

    return u.mapInPandas(run, schema=out_schema)
