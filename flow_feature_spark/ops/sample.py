"""Deterministic sampling operators for training-data pipelines.

Spark's ``df.sample`` is seed-dependent on partitioning (a repartition
changes which rows survive), which breaks resumability and cross-engine
verification. These operators derive the sampling decision from a HASH OF
THE ROW KEY instead: the same row is always in or out, on any cluster
layout, any engine, any restart — the property a resumable corpus pipeline
needs (the same discipline as keys.py's SHA256 group keys; reference basis
flow.py:237-251's content-derived keys).

Both are pure column expressions (hash + comparison / one window), zero or
one shuffle, trivially scale-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# denominator for the hash-threshold test; 2^48 keeps the md5-derived int
# (15 hex digits = 60 bits) comfortably uniform over the modulus
SAMPLE_MOD = 1 << 48


def _md5int(x: Column) -> Column:
    """First 15 hex digits of md5 as a bigint — the shared cross-engine
    hash primitive (same construction as ops/dedup.py signatures)."""
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("bigint")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a row iff md5(salt || key) mod 2^48 < fraction * 2^48.

    Content-addressed Bernoulli sampling: stable under repartition, restart
    and engine; different ``salt`` values draw independent samples (the knob
    a train/validation split uses). Expected |out| = fraction * |in|.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    h = _md5int(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.filter(F.pmod(h, F.lit(SAMPLE_MOD)) < int(fraction * SAMPLE_MOD))


def stratified_topk(
    df: DataFrame,
    group_col: str = "source",
    k: int = 10,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly k rows per stratum (fewer if the stratum is smaller), chosen
    by md5 order — a deterministic per-group reservoir. One window shuffle on
    the stratum key; heavy strata cost a sort of their own rows only (at
    extreme skew, pre-thin with deterministic_sample at a fraction that
    leaves ~10k x k candidates, then rank)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = _md5int(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
    )
