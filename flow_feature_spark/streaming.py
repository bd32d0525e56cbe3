"""Structured Streaming surface (SURVEY.md §2.8 — upgrade path).

The reference is strictly batch (whole-file ``rdpcap``; streaming listed as
future work in its CHANGES.md:196-198), so streaming is NOT parity scope.
This module provides the documented upgrade path the north rule anticipates:

* ``stream_session_counts`` — the reference's *basic edition* incremental
  aggregates (flow_basic.py:41-76: running count / byte sum / min / max) as a
  native Structured Streaming query: ``withWatermark`` + ``session_window``
  (gap-close semantics identical to the batch lag+cumsum sessionizer for
  in-order data), emitting one row per closed session.
* The full 72-vector needs ordered per-session turn history (per-direction
  inter-turn gaps), which is ``applyInPandasWithState`` territory: keep the
  per-(conv) running arrays in state, flush a vector when the gap closes a
  session. Sketch provided as ``FULL_VECTOR_STATEFUL_SKETCH`` for round 2+;
  the batch kernel remains the system of record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_counts(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming per-session incremental aggregates (basic-edition analog).

    Works on a streaming DataFrame (``spark.readStream``). Late data beyond
    the watermark is dropped; a session closes ``gap`` after its last event.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(conv_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("turn_cnt"),
            F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias("byte_cnt"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            conv_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "turn_cnt",
            "byte_cnt",
            "first_ts",
            "last_ts",
        )
    )


FULL_VECTOR_STATEFUL_SKETCH = """
def stateful_features(key, pdf_iter, state):  # applyInPandasWithState
    # state value: (ts_us[], is_fwd[], plen[], win[], flags[], ihl[]) arrays
    # of the conv's open session, + session ordinal
    buf = state.get() if state.exists else empty_buffers()
    for pdf in pdf_iter:
        buf = append(buf, pdf)                    # arrive in event-time order
        for closed in split_on_gap(buf, GAP_US):  # all but the open tail
            yield feature_vector_frame(closed)    # the batch kernel, reused
        buf = open_tail(buf, GAP_US)
    if state.hasTimedOut:                         # watermark passed the gap
        yield feature_vector_frame(buf); state.remove()
    else:
        state.update(buf); state.setTimeoutTimestamp(last_ts(buf) + GAP_MS)
df.groupBy("conv_id").applyInPandasWithState(
    stateful_features, FEATURE_SCHEMA, STATE_SCHEMA,
    "append", GroupStateTimeout.EventTimeTimeout)
"""
