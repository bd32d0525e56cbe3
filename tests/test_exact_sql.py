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
