"""Schemas and the fixed 72-feature contract.

The feature list replicates the reference's authoritative ``feature_name``
(reference: flow.py:29-63, ``len(feature_name) == 72``) with the transcript
mapping from SURVEY.md §1.4:

* packet          -> turn (one row of the transcript table)
* flow key        -> (conv_id, session_id) after gap sessionization
* ``pkt.time``    -> ``ts`` (timestamp[us] -> epoch seconds as double)
* direction fwd   -> ``role == 'user'`` (everything else is backward)
* ``len(pkt)``    -> ``length(text)`` characters
* ``tcp.window``  -> per-turn numeric budget column ``win`` (token count for
                     transcripts; ``value`` for the events oracle table)
* ``tcp.flags``   -> integer bitmask ``flags`` derived from the ``tool`` column
                     (or ``value % 256`` for events), bit-decomposed into 8
                     counters exactly like flow.py:374-378
* ``ip.ihl``      -> per-turn metadata size ``ihl`` (length(role)); header
                     length per turn = 14 + 4*ihl + 20 (flow.py:18-19, 397)
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 72 feature names, byte-for-byte the reference order (flow.py:29-63).
# ---------------------------------------------------------------------------
FEATURE_NAMES: list[str] = [
    # Inter-arrival (inter-turn gap) statistics (12)
    "fiat_mean", "fiat_min", "fiat_max", "fiat_std",
    "biat_mean", "biat_min", "biat_max", "biat_std",
    "diat_mean", "diat_min", "diat_max", "diat_std",
    # Session duration (1)
    "duration",
    # Window-size (per-turn budget) statistics (15)
    "fwin_total", "fwin_mean", "fwin_min", "fwin_max", "fwin_std",
    "bwin_total", "bwin_mean", "bwin_min", "bwin_max", "bwin_std",
    "dwin_total", "dwin_mean", "dwin_min", "dwin_max", "dwin_std",
    # Turn count features (7)
    "fpnum", "bpnum", "dpnum", "bfpnum_rate", "fpnum_s", "bpnum_s", "dpnum_s",
    # Text length features (19)
    "fpl_total", "fpl_mean", "fpl_min", "fpl_max", "fpl_std",
    "bpl_total", "bpl_mean", "bpl_min", "bpl_max", "bpl_std",
    "dpl_total", "dpl_mean", "dpl_min", "dpl_max", "dpl_std",
    "bfpl_rate", "fpl_s", "bpl_s", "dpl_s",
    # Tool/flag count features (12)
    "fin_cnt", "syn_cnt", "rst_cnt", "pst_cnt",
    "ack_cnt", "urg_cnt", "cwe_cnt", "ece_cnt",
    "fwd_pst_cnt", "fwd_urg_cnt", "bwd_pst_cnt", "bwd_urg_cnt",
    # Header (metadata) length features (6)
    "fp_hdr_len", "bp_hdr_len", "dp_hdr_len", "f_ht_len", "b_ht_len", "d_ht_len",
]
assert len(FEATURE_NAMES) == 72

# Header-length constants (flow.py:18-19).
ETHERNET_HEADER_LEN = 14
TCP_HEADER_BASE_LEN = 20

# Duration anti-div-zero epsilon (flow.py:148).
DURATION_EPSILON = 0.0001

# Forward direction role (flow_divide src match, flow.py:286).
FWD_ROLE = "user"

# Tool name -> flag bit, the transcript analog of the TCP flag bit field
# [FIN, SYN, RST, PSH, ACK, URG, CWE, ECE] (flow.py:360).  Deterministic,
# SQL-expressible (CASE WHEN), 8 canonical tool categories.
TOOL_FLAG_BITS: dict[str, int] = {
    "finish": 0,
    "search": 1,
    "retry": 2,
    "python": 3,   # PSH analog -> *_pst_cnt
    "answer": 4,
    "browse": 5,   # URG analog -> *_urg_cnt
    "write": 6,
    "edit": 7,
}

# ---------------------------------------------------------------------------
# Input table schema (BASELINE.json input_hint, exact shape).
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

PROBE_SCHEMA = T.StructType([
    T.StructField("entity_id", T.StringType(), False),
    T.StructField("probe_ts", T.TimestampType(), False),
])

# Kernel input columns (after normalize_turns): the minimal physical projection.
KERNEL_INPUT_COLS = [
    "conv_id", "session_id", "turn_idx", "ts_us",
    "is_fwd", "plen", "win", "flags", "ihl",
]


def feature_struct(
    key_fields: list[tuple[str, T.DataType]] | None = None,
) -> T.StructType:
    """Output StructType: key columns + session metadata + 72 doubles.

    Declared once, order-preserving — the analog of the reference's fixed
    CSV schema (flow.py:480-481).
    """
    if key_fields is None:
        key_fields = [("conv_id", T.StringType()), ("session_id", T.LongType())]
    fields = [T.StructField(n, t, False) for n, t in key_fields]
    fields += [
        T.StructField("session_start_ts", T.DoubleType(), True),
        T.StructField("session_end_ts", T.DoubleType(), True),
        T.StructField("n_turns", T.LongType(), True),
    ]
    fields += [T.StructField(name, T.DoubleType(), True) for name in FEATURE_NAMES]
    return T.StructType(fields)


FEATURE_SCHEMA = feature_struct()
