"""Salt-bucketed partial-moment aggregation vs the exact kernel (SURVEY.md
§4.1): tiny buckets force many boundary stitches; hot conv exercises skew."""

from __future__ import annotations

import numpy as np
import pytest

from flow_feature_spark.kernel import extract_session_features
from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.salted import salted_session_features
from flow_feature_spark.schema import FEATURE_NAMES
from flow_feature_spark.sessionize import assign_sessions
from flow_feature_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def sess(spark):
    tr = synth_transcripts(spark, n_convs=30, turns_mean=20, hot_factor=60)
    return assign_sessions(normalize_turns(tr), gap_seconds=1800.0).cache()


def _collect(df):
    return {
        (r["conv_id"], r["session_id"]): np.array([r[n] for n in FEATURE_NAMES])
        for r in df.collect()
    }


@pytest.mark.parametrize("rounding", ["half_even", "r6"])
@pytest.mark.parametrize("bucket_turns", [7, 100000])
def test_salted_matches_exact_kernel(spark, sess, bucket_turns, rounding):
    """Exact-integer partial moments + kernel-identical float sequence =>
    BIT-EQUAL to the unsalted kernel (not merely allclose)."""
    exact = _collect(extract_session_features(sess, rounding=rounding))
    salted = _collect(
        salted_session_features(sess, bucket_turns=bucket_turns, rounding=rounding)
    )
    assert set(exact) == set(salted)
    for k in exact:
        np.testing.assert_array_equal(
            salted[k], exact[k],
            err_msg=str(
                [
                    (n, a, b)
                    for n, a, b in zip(FEATURE_NAMES, salted[k], exact[k])
                    if a != b
                ]
            ),
        )


def test_adaptive_routing_matches_fused(spark, sess):
    """Adaptive split (hot -> salted, cold -> fused) must reproduce the plain
    fused pipeline allclose, with the hot conv actually routed."""
    from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
    from flow_feature_spark.prepare import normalize_turns
    from flow_feature_spark.salted import adaptive_session_features
    from flow_feature_spark.synth import synth_transcripts

    tr = synth_transcripts(spark, n_convs=30, turns_mean=20, hot_factor=60)
    turns = normalize_turns(tr).cache()
    base = _collect(sessionize_and_extract_fast(turns, 1800.0, rounding="half_even"))
    # threshold below the hot conv's turn count so it takes the salted path
    adaptive = _collect(
        adaptive_session_features(turns, 1800.0, rounding="half_even",
                                  hot_turn_threshold=500)
    )
    assert set(base) == set(adaptive)
    for k in base:
        np.testing.assert_array_equal(adaptive[k], base[k])


def test_adaptive_routes_order_violators_to_exact_kernel(spark):
    """A hot conversation whose ts is NOT non-decreasing in turn_idx violates
    the bucketized precondition (salted.py:23-27): the runtime guard must
    detect it and route it through the order-agnostic grouped kernel, so the
    adaptive output stays bit-equal to the plain fused pipeline anyway."""
    from pyspark.sql import functions as F

    from flow_feature_spark.kernel_fast import sessionize_and_extract_fast
    from flow_feature_spark.salted import adaptive_session_features
    from flow_feature_spark.synth import synth_transcripts

    tr = synth_transcripts(spark, n_convs=30, turns_mean=20, hot_factor=60)
    turns = normalize_turns(tr)
    # find the hot conv and REVERSE its turn_idx (ts ordering now decreasing
    # in turn_idx — maximal violation of the bucket-stitch precondition)
    hot_conv = (
        turns.groupBy("conv_id").count().orderBy(F.desc("count")).first()["conv_id"]
    )
    mx = turns.filter(F.col("conv_id") == hot_conv).agg(
        F.max("turn_idx")
    ).first()[0]
    shuffled = turns.withColumn(
        "turn_idx",
        F.when(
            F.col("conv_id") == hot_conv, F.lit(mx) - F.col("turn_idx")
        ).otherwise(F.col("turn_idx")).cast("int"),
    ).cache()
    base = _collect(
        sessionize_and_extract_fast(shuffled, 1800.0, rounding="half_even")
    )
    adaptive = _collect(
        adaptive_session_features(
            shuffled, 1800.0, rounding="half_even", hot_turn_threshold=500,
            bucket_turns=64,
        )
    )
    assert set(base) == set(adaptive)
    for k in base:
        np.testing.assert_array_equal(adaptive[k], base[k])
