"""Turn normalization: transcript rows -> kernel input columns.

Pure column expressions (JVM-side, whole-stage codegen). This is the analog of
the reference's per-packet field extraction (flow.py:326, 347, 375, 397) done
declaratively so Catalyst prunes the parquet scan down to the used columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flow_feature_spark.schema import FWD_ROLE, TOOL_FLAG_BITS


def ts_seconds(ts: Column) -> Column:
    """timestamp -> epoch seconds as double, exact at microsecond precision.

    ``unix_micros`` keeps integer micros; the single /1e6 division is the one
    float op, identical across engines (used verbatim in the DuckDB oracles as
    ``epoch_us(ts)/1e6``). Parquet TIMESTAMP_NTZ is cast to TIMESTAMP first —
    the session timezone is pinned to UTC, so the cast is a pure reinterpret
    that agrees with DuckDB's naive-UTC timestamps.
    """
    return F.unix_micros(ts.cast("timestamp")) / F.lit(1e6)


def tool_flags(tool: Column) -> Column:
    """tool name -> 8-bit bitmask (the TCP-flags analog, flow.py:375-378)."""
    expr = F.lit(0)
    for name, bit in TOOL_FLAG_BITS.items():
        expr = F.when(tool == name, F.lit(1 << bit)).otherwise(expr)
    return expr.cast("int")


def token_count(text: Column) -> Column:
    """Whitespace token count (the tcp.window analog for transcripts)."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def filter_valid_turns(df: DataFrame, ts_col: str = "ts", conv_col: str = "conv_id") -> DataFrame:
    """Keep only well-formed turns: non-null key and timestamp.

    The transcript analog of the reference's ``is_TCP_packet`` admission
    filter (flow.py:413-428: drop packets without IP/TCP layers before
    grouping) — malformed rows never reach the key pipeline.
    """
    return df.filter(F.col(conv_col).isNotNull() & F.col(ts_col).isNotNull())


def drop_housekeeping(
    df: DataFrame,
    roles: tuple[str, ...] = ("system",),
    min_len: int = 8,
) -> DataFrame:
    """Filter out housekeeping turns: system-role rows and near-empty turns.

    Analog of the reference's ``is_handshake_packet`` (flow.py:430-444 — drop
    SYN/FIN handshakes and bare ACKs < 61 B). Like the reference, which
    defines the filter but never calls it, this is OFF by default and opt-in
    via job.py --drop-housekeeping.
    """
    bare = (F.col("plen") < min_len) & F.col("flags").isNotNull() & (F.col("flags") == 0)
    # coalesce: a NULL role must KEEP the row — role.isin(...) is NULL for
    # NULL roles, and ~(NULL | false) is NULL, which filter() would drop
    is_housekeeping = F.coalesce(F.col("role").isin(*roles), F.lit(False)) | bare
    return df.filter(~is_housekeeping)


def with_source_file(df: DataFrame, col: str = "source") -> Column | DataFrame:
    """Tag each row with the basename of the file it was scanned from (F10).

    Analog of the reference's per-pcap identifier prefix
    (get_flow_feature.py:57: ``[pcap_name, flow_num] + features``): a
    directory of per-day shards keeps its per-shard breakdown. Must be
    applied directly on the scanned DataFrame, before any shuffle —
    ``input_file_name()`` is only defined at scan time.
    """
    return df.withColumn(
        col, F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def tag_protocol(
    df: DataFrame,
    proto_col: str = "role",
    mapping: dict[str, str] | None = None,
    keep: tuple[str, ...] = ("TCP", "UDP"),
    tag_col: str = "proto",
) -> DataFrame:
    """Classify-then-filter on a protocol-like column (P2, basic edition).

    The reference's two-protocol predicate (flow_basic.py:113-124: ip.proto
    6 -> "TCP", 17 -> "UDP", anything else dropped) as an explicit operator:
    map raw values to protocol tags via ``mapping``, keep only rows whose tag
    is in ``keep``. Unmapped (or NULL) values are dropped, mirroring the
    reference's silent skip of other protocols.
    """
    if mapping is None:
        # transcript default: dialog turns are the TCP analog (stateful,
        # bidirectional), telemetry/system turns the UDP analog
        mapping = {"user": "TCP", "assistant": "TCP", "system": "UDP"}
    tag = F.lit(None).cast("string")
    for raw, name in mapping.items():
        tag = F.when(F.col(proto_col) == raw, F.lit(name)).otherwise(tag)
    return df.withColumn(tag_col, tag).filter(F.col(tag_col).isin(*keep))


def normalize_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
    fwd_role: str = FWD_ROLE,
) -> DataFrame:
    """Project a transcript-shaped table onto the kernel input columns.

    Output: conv_id, turn_idx, ts (kept), ts_us (canonical int64 micros —
    all gap math happens in this exact domain; double ULP at epoch-seconds
    scale is ~0.5 µs, so subtracting rounded double seconds would drift),
    ts_sec (display/compat), is_fwd, plen, win, flags, ihl, plus the original
    text (for per-turn invariant checks downstream).
    """
    return df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("int").alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        ts_seconds(F.col(ts_col)).alias("ts_sec"),
        (F.col(role_col) == fwd_role).alias("is_fwd"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("plen"),
        token_count(F.col(text_col)).alias("win"),
        tool_flags(F.col(tool_col)).alias("flags"),
        F.length(F.coalesce(F.col(role_col), F.lit(""))).cast("long").alias("ihl"),
    )
