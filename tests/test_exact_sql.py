"""JVM-only exact SQL path: session_features_exact_sql must be BIT-EQUAL to
the Arrow kernel (r6) on the same turns — the no-Python-boundary engine."""

from __future__ import annotations

import numpy as np

from flow_feature_spark.features import session_features_exact_sql
from flow_feature_spark.kernel import extract_session_features
from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.schema import FEATURE_NAMES
from flow_feature_spark.sessionize import assign_sessions
from flow_feature_spark.synth import synth_transcripts


def _collect(df):
    return {
        (r["conv_id"], r["session_id"]): np.array(
            [r["session_start_ts"], r["session_end_ts"], r["n_turns"]]
            + [r[n] for n in FEATURE_NAMES]
        )
        for r in df.collect()
    }


def test_exact_sql_bit_equal_to_kernel(spark):
    tr = synth_transcripts(spark, n_convs=40, turns_mean=15, hot_factor=10)
    turns = normalize_turns(tr).cache()
    sql_side = _collect(session_features_exact_sql(turns, gap_seconds=1800.0))
    kern = _collect(
        extract_session_features(
            assign_sessions(turns, gap_seconds=1800.0), rounding="r6"
        )
    )
    assert set(sql_side) == set(kern)
    for k in kern:
        np.testing.assert_array_equal(
            sql_side[k], kern[k],
            err_msg=str([
                (n, a, b)
                for n, a, b in zip(
                    ["start", "end", "n"] + FEATURE_NAMES, sql_side[k], kern[k]
                )
                if a != b
            ]),
        )


def test_exact_sql_reset_tool_matches_kernel(spark):
    """--reset-tool threads through the SQL engine for real (no silent
    fallback): sessionization with a force-new tool bit must match the
    grouped kernel over assign_sessions(reset_tool=...) bit-for-bit (r6)."""
    tr = synth_transcripts(spark, n_convs=40, turns_mean=15, hot_factor=10)
    turns = normalize_turns(tr).cache()
    sql_side = _collect(
        session_features_exact_sql(turns, gap_seconds=1800.0, reset_tool="retry")
    )
    kern = _collect(
        extract_session_features(
            assign_sessions(turns, gap_seconds=1800.0, reset_tool="retry"),
            rounding="r6",
        )
    )
    assert set(sql_side) == set(kern)
    for k in kern:
        np.testing.assert_array_equal(sql_side[k], kern[k])
    # the reset must actually change the sessionization (not a no-op thread)
    plain = _collect(session_features_exact_sql(turns, gap_seconds=1800.0))
    assert set(plain) != set(sql_side)


def test_exact_sql_half_even_allclose_to_kernel(spark):
    """rounding='half_even' threads through as bround: allclose (documented
    as allclose-grade, not bit-exact — shortest-decimal vs exact-binary)."""
    tr = synth_transcripts(spark, n_convs=30, turns_mean=12, hot_factor=5)
    turns = normalize_turns(tr).cache()
    sql_side = _collect(
        session_features_exact_sql(turns, gap_seconds=1800.0, rounding="half_even")
    )
    kern = _collect(
        extract_session_features(
            assign_sessions(turns, gap_seconds=1800.0), rounding="half_even"
        )
    )
    assert set(sql_side) == set(kern)
    for k in kern:
        np.testing.assert_allclose(sql_side[k], kern[k], rtol=0, atol=1.1e-6)


def test_exact_sql_concurrent_views_do_not_collide(spark):
    """Two pipelines BUILT before either executes must not rebind each
    other's turns view (uuid-suffixed view names)."""
    tr1 = synth_transcripts(spark, n_convs=10, turns_mean=8, hot_factor=2)
    tr2 = synth_transcripts(spark, n_convs=25, turns_mean=8, hot_factor=2)
    t1, t2 = normalize_turns(tr1), normalize_turns(tr2)
    df1 = session_features_exact_sql(t1, gap_seconds=1800.0)
    df2 = session_features_exact_sql(t2, gap_seconds=1800.0)  # build BEFORE df1 runs
    n1, n2 = df1.count(), df2.count()
    k1 = extract_session_features(assign_sessions(t1, 1800.0), rounding="r6").count()
    k2 = extract_session_features(assign_sessions(t2, 1800.0), rounding="r6").count()
    assert (n1, n2) == (k1, k2)
    assert n1 != n2  # the two inputs genuinely differ
