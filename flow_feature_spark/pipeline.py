"""End-to-end pipelines: transcripts -> sessions -> feature vectors.

One logical plan: scan (column-pruned) -> normalize (codegen exprs) ->
sessionize (single shuffle on conv_id) -> grouped kernel or expression twin.
The sessionize window and the feature groupBy share the conv_id hash
partitioning, so Catalyst plans exactly one exchange for the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flow_feature_spark.features import session_features_expr
from flow_feature_spark.kernel import attach_feature_ts, extract_session_features
from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.sessionize import DEFAULT_SESSION_GAP_S, assign_sessions


def transcript_features(
    df: DataFrame,
    gap_seconds: float = DEFAULT_SESSION_GAP_S,
    engine: str = "kernel",
    rounding: str = "half_even",
    **normalize_kwargs,
) -> DataFrame:
    """Transcript table -> per-(conv_id, session_id) 72-feature rows.

    engine='kernel' uses the Arrow-batched pandas kernel (reference-parity
    rounding); engine='fast' the fused batch kernel (fewest shuffles);
    engine='exact-sql' the exact-domain pure-SQL twin (bit-equal to the
    kernels, no Python boundary); engine='expr' the float Catalyst twin
    (allclose only).
    """
    turns = normalize_turns(df, **normalize_kwargs)
    if engine == "fast":
        # fused path: sessionization happens inside the batch kernel's single
        # sorted pass — one exchange for the whole pipeline.
        from flow_feature_spark.kernel_fast import sessionize_and_extract_fast

        return attach_feature_ts(
            sessionize_and_extract_fast(turns, gap_seconds=gap_seconds, rounding=rounding)
        )
    if engine == "exact-sql":
        from flow_feature_spark.features import session_features_exact_sql

        return attach_feature_ts(
            session_features_exact_sql(turns, gap_seconds=gap_seconds)
        )
    sess = assign_sessions(turns, gap_seconds=gap_seconds)
    if engine == "kernel":
        feats = extract_session_features(sess, rounding=rounding)
    elif engine == "expr":
        feats = session_features_expr(sess)
    else:
        raise ValueError(f"unknown engine: {engine}")
    return attach_feature_ts(feats)
