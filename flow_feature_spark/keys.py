"""Flow-key canonicalization and hashing as pure column expressions.

Replicates the reference's key pipeline declaratively so Catalyst codegens it
(no Python in the hot path):

* ``normalize_endpoints`` — direction normalization: higher port first; on a
  port tie the numerically larger dot-stripped IP wins (reference:
  flow.py:210-235 ``NormalizationSrcDst``).
* ``tuple_hash_col`` — SHA256 of ``src + str(sport) + dst + str(dport) + proto``
  concatenated with NO separator (reference: flow.py:237-251 ``tuple2hash``).

conv_id in the transcript domain is already canonical; these are kept as
first-class operators for structural parity (SURVEY.md §2.2 P5/P6) and as the
salt-bucket hash source.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ip_as_long(ip: Column) -> Column:
    # "".join(src.split('.')) then int() — flow.py:228-230.
    return F.regexp_replace(ip, r"\.", "").cast("long")


def normalize_endpoints(
    src: Column, sport: Column, dst: Column, dport: Column
) -> Column:
    """Return struct(src, sport, dst, dport) with the canonical endpoint first.

    Semantics of flow.py:225-235: if sport < dport swap; if equal compare the
    dot-stripped integer IPs and put the larger first; else keep.
    """
    keep = F.struct(
        src.alias("src"), sport.alias("sport"), dst.alias("dst"), dport.alias("dport")
    )
    swap = F.struct(
        dst.alias("src"), dport.alias("sport"), src.alias("dst"), sport.alias("dport")
    )
    return (
        F.when(sport < dport, swap)
        .when((sport == dport) & (_ip_as_long(src) < _ip_as_long(dst)), swap)
        .otherwise(keep)
    )


def tuple_hash_col(
    src: Column, sport: Column, dst: Column, dport: Column, proto: Column | None = None
) -> Column:
    """SHA256 hex digest of the concatenated 5-tuple (no separator)."""
    proto = F.lit("TCP") if proto is None else proto
    return F.sha2(
        F.concat(
            src, sport.cast("string"), dst, dport.cast("string"), proto
        ),
        256,
    )
