from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flow_feature_spark.prepare import normalize_turns
from flow_feature_spark.sessionize import assign_sessions, dedup_turns


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (c, i, r, t, None, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
            for (c, i, r, t, s) in rows
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_gap_split(spark):
    rows = [
        ("c1", 0, "user", "a", 0),
        ("c1", 1, "assistant", "b", 10),
        ("c1", 2, "user", "c", 4000),      # > 1800s gap -> new session
        ("c1", 3, "assistant", "d", 4005),
        ("c2", 0, "user", "x", 0),
    ]
    out = assign_sessions(normalize_turns(_mk(spark, rows)), gap_seconds=1800.0)
    got = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in out.collect()}
    assert got == {
        ("c1", 0): 1, ("c1", 1): 1, ("c1", 2): 2, ("c1", 3): 2, ("c2", 0): 1,
    }


def test_tie_ordering_uses_turn_idx(spark):
    # two turns at the identical ts: ordering must fall back to turn_idx
    rows = [("c1", 1, "user", "b", 5), ("c1", 0, "user", "a", 5), ("c1", 2, "user", "c", 6)]
    out = assign_sessions(normalize_turns(_mk(spark, rows)), gap_seconds=1800.0)
    assert out.filter(F.col("session_id") != 1).count() == 0


def test_dedup_turns(spark):
    rows = [
        ("c1", 0, "user", "a", 0),
        ("c1", 0, "user", "a", 0),     # exact duplicate (restart replay)
        ("c1", 1, "user", "b", 1),
        ("c1", 1, "user", "b-late", 9),  # later duplicate: earliest wins
    ]
    out = dedup_turns(_mk(spark, rows))
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.collect()}
    assert got == {("c1", 0): "a", ("c1", 1): "b"}
    assert out.count() == 2


def test_reset_tool_opens_session(spark):
    rows = [
        ("c1", 0, "user", "a", None, 0),
        ("c1", 1, "assistant", "b", "finish", 10),  # finish -> new session
        ("c1", 2, "user", "c", None, 20),
    ]
    import datetime as dt

    df = spark.createDataFrame(
        [
            (c, i, r, t, tool, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
            for (c, i, r, t, tool, s) in rows
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = assign_sessions(normalize_turns(df), gap_seconds=1800.0, reset_tool="finish")
    got = {r["turn_idx"]: r["session_id"] for r in out.collect()}
    assert got == {0: 1, 1: 2, 2: 2}


def test_drop_housekeeping(spark):
    from flow_feature_spark.prepare import drop_housekeeping

    rows = [
        ("c1", 0, "user", "hello there friend", None, 0),
        ("c1", 1, "system", "sys housekeeping", None, 1),   # dropped: role
        ("c1", 2, "assistant", "ok", None, 2),               # dropped: bare short
        ("c1", 3, "assistant", "ok", "python", 3),           # kept: has tool flag
    ]
    import datetime as dt

    df = spark.createDataFrame(
        [
            (c, i, r, t, tool, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
            for (c, i, r, t, tool, s) in rows
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = drop_housekeeping(normalize_turns(df))
    assert sorted(r["turn_idx"] for r in out.collect()) == [0, 3]
