"""Property-based kernel parity (hypothesis): random turn groups, the NumPy
kernel must match the loop-style reference oracle within one rounding quantum,
and both exact sentinels/guards must hold on arbitrary inputs (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flow_feature_spark.kernel import feature_vector
from flow_feature_spark.schema import FEATURE_NAMES

from tests.reference_kernel import ref_feature_vector

turn = st.tuples(
    st.integers(min_value=0, max_value=10_000_000_000),  # ts offset µs
    st.booleans(),                                       # is_fwd
    st.integers(min_value=0, max_value=100_000),         # plen
    st.integers(min_value=0, max_value=100_000),         # win
    st.integers(min_value=0, max_value=255),             # flags
    st.integers(min_value=0, max_value=60),              # ihl
)

groups = st.lists(turn, min_size=0, max_size=60)

BASE_US = 1_700_000_000_000_000


def _to_arrays(rows):
    rows = sorted(rows, key=lambda t: t[0])
    ts = np.array([BASE_US + r[0] for r in rows], dtype=np.int64)
    return dict(
        ts_us=ts,
        is_fwd=np.array([r[1] for r in rows], dtype=bool),
        plen=np.array([r[2] for r in rows], dtype=np.int64),
        win=np.array([r[3] for r in rows], dtype=np.int64),
        flags=np.array([r[4] for r in rows], dtype=np.int64),
        ihl=np.array([r[5] for r in rows], dtype=np.int64),
    )


def _to_dicts(rows):
    rows = sorted(rows, key=lambda t: t[0])
    return [
        dict(ts_us=BASE_US + r[0], turn_idx=i, is_fwd=r[1], plen=r[2],
             win=r[3], flags=r[4], ihl=r[5])
        for i, r in enumerate(rows)
    ]


@settings(max_examples=200, deadline=None)
@given(groups)
def test_kernel_matches_reference_oracle(rows):
    got = feature_vector(**_to_arrays(rows))
    expected = ref_feature_vector(_to_dicts(rows))
    if expected is None:
        assert got is None
        return
    np.testing.assert_allclose(
        got, expected, rtol=1e-6, atol=1.2e-6,
        err_msg=str([
            (n, a, b) for n, a, b in zip(FEATURE_NAMES, got, expected)
            if not np.isclose(a, b, rtol=1e-6, atol=1.2e-6)
        ]),
    )


@settings(max_examples=100, deadline=None)
@given(groups)
def test_invariants(rows):
    vec = feature_vector(**_to_arrays(rows))
    if vec is None:
        assert len(rows) <= 1
        return
    d = dict(zip(FEATURE_NAMES, vec))
    # structural invariants that hold for ANY input
    assert d["dpnum"] == d["fpnum"] + d["bpnum"] == len(rows)
    assert d["duration"] >= 0.0001
    assert d["dpnum_s"] == d["fpnum_s"] + d["bpnum_s"]
    assert d["dpl_s"] == d["fpl_s"] + d["bpl_s"]
    assert d["dp_hdr_len"] == d["fp_hdr_len"] + d["bp_hdr_len"]
    # sentinel asymmetry: empty direction -> -1 flags but 0.0 win/len stats
    if d["fpnum"] == 0:
        assert d["fwd_pst_cnt"] == -1.0 and d["fwd_urg_cnt"] == -1.0
        assert d["fwin_total"] == 0.0 and d["fpl_std"] == 0.0
    else:
        assert d["fwd_pst_cnt"] >= 0.0
    if d["bpnum"] == 0:
        assert d["bwd_pst_cnt"] == -1.0 and d["bwd_urg_cnt"] == -1.0
    # stats ordering
    for p in ("fiat", "biat", "diat", "fwin", "bwin", "dwin", "fpl", "bpl", "dpl"):
        assert d[f"{p}_min"] <= d[f"{p}_max"] + 1e-9
    # combined flag counts bound by turn count
    for f in ("fin_cnt", "syn_cnt", "rst_cnt", "pst_cnt",
              "ack_cnt", "urg_cnt", "cwe_cnt", "ece_cnt"):
        assert -1.0 <= d[f] <= len(rows)


# ---------------------------------------------------------------------------
# Salted-merge property: for ANY contiguous bucketing of a sorted group, the
# exact partial moments + stitch merge must be BIT-EQUAL to the direct kernel
# (SURVEY.md §4.1). Partials are built here in pure Python with the same
# exact-domain semantics as salted._partial_aggs.
# ---------------------------------------------------------------------------

def _partials_frame(rows, bucket_size):
    """rows: list of dicts sorted by (ts_us, turn_idx) -> one partial-moment
    row per contiguous bucket, mirroring the SQL aggregation exactly."""
    import pandas as pd

    def hdr(r):
        return 14 + 4 * r["ihl"] + 20

    out = []
    for b0 in range(0, len(rows), bucket_size):
        bucket = rows[b0:b0 + bucket_size]
        row = {
            "bucket": b0 // bucket_size,
            "n": len(bucket),
            "min_us": min(r["ts_us"] for r in bucket),
            "max_us": max(r["ts_us"] for r in bucket),
        }
        for d, pred in (("f", lambda r: r["is_fwd"]),
                        ("b", lambda r: not r["is_fwd"]),
                        ("d", lambda r: True)):
            sel = [r for r in bucket if pred(r)]
            row[f"{d}_n"] = len(sel)
            row[f"{d}_first_us"] = sel[0]["ts_us"] if sel else 0
            row[f"{d}_last_us"] = sel[-1]["ts_us"] if sel else 0
            gaps = [b["ts_us"] - a["ts_us"] for a, b in zip(sel, sel[1:])]
            row[f"{d}_gap_n"] = len(gaps)
            row[f"{d}_gap_sum"] = sum(gaps)
            row[f"{d}_gap_sumsq"] = sum(g * g for g in gaps)
            row[f"{d}_gap_min"] = min(gaps) if gaps else 0
            row[f"{d}_gap_max"] = max(gaps) if gaps else 0
            for col in ("win", "plen"):
                vals = [r[col] for r in sel]
                row[f"{d}_{col}_sum"] = sum(vals)
                row[f"{d}_{col}_sumsq"] = sum(v * v for v in vals)
                row[f"{d}_{col}_min"] = min(vals) if vals else 0
                row[f"{d}_{col}_max"] = max(vals) if vals else 0
            row[f"{d}_hdr"] = sum(hdr(r) for r in sel)
        for i in range(8):
            bit = lambda r: (r["flags"] >> i) & 1  # noqa: E731
            row[f"flag{i}"] = sum(bit(r) for r in bucket)
            if i in (3, 5):
                row[f"fwd_flag{i}"] = sum(bit(r) for r in bucket if r["is_fwd"])
                row[f"bwd_flag{i}"] = sum(bit(r) for r in bucket if not r["is_fwd"])
        out.append(row)
    return pd.DataFrame(out)


@settings(max_examples=150, deadline=None)
@given(groups, st.integers(min_value=1, max_value=20),
       st.sampled_from(["half_even", "r6"]))
def test_salted_merge_bit_equal_for_any_bucketing(rows, bucket_size, rounding):
    from flow_feature_spark.salted import _merge_session

    dicts = _to_dicts(rows)
    got = None
    if dicts:
        merged = _merge_session(_partials_frame(dicts, bucket_size), rounding)
        got = [merged[n] for n in FEATURE_NAMES] if merged is not None else None
    direct = feature_vector(**_to_arrays(rows), rounding=rounding)
    if direct is None or not dicts:
        assert got is None
        return
    assert got == list(direct), str([
        (n, a, b) for n, a, b in zip(FEATURE_NAMES, got, direct) if a != b
    ])
