"""Deterministic synthetic transcript + probe generator.

Fully distributed and **closed-form**: every column is a pure expression of
(conv index, turn index) via ``xxhash64`` — no window, no shuffle, no driver
loop — so generation itself scales linearly with cores and row count, and the
data is bit-identical regardless of partitioning (seeded, per FIXTURES.md).

Edge cases covered (FIXTURES.md §1):
* single-turn conversations (dropped by the kernel, flow.py:136-137)
* mono-role conversations (empty fwd direction -> -1 flag sentinels)
* timestamp ties within a conversation (turn_idx tiebreak)
* zero-duration conversations (all turns same ts -> duration = epsilon)
* long gaps > session threshold (multiple sessions per conv_id)
* one hot conv_id with ~100x median turns (skew/salting path)
* unicode / empty-string text
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_feature_spark.schema import TOOL_FLAG_BITS

# Base epoch: 2024-01-01 00:00:00 UTC, microseconds.
BASE_US = 1_704_067_200_000_000
STEP_US = 500_000           # nominal inter-turn step
JITTER_US = 300_000         # < STEP_US, keeps ts monotone in effective index
BLOCK = 9                   # a long gap may open every BLOCK turns
LONG_GAP_US = 3_600_000_000  # 1 h  (>> default session threshold of 30 min)

_VOCAB = (
    "the quick brown fox jumps over lazy dog spark shuffle partition arrow "
    "kernel feature vector session gap window lag lead backfill probe join "
    "naïve café 数据 流 🙂 tensor batch "
)
_TOOLS = sorted(TOOL_FLAG_BITS, key=TOOL_FLAG_BITS.get)


def _h(*cols) -> F.Column:
    """Non-negative deterministic hash of the given columns/literals."""
    return F.abs(F.xxhash64(*[F.lit(c) if isinstance(c, (str, int)) else c for c in cols]))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    turns_mean: int = 30,
    hot_factor: int = 100,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the transcript table (conv_id, turn_idx, role, text, tool, ts)."""
    conv = spark.range(n_convs, numPartitions=partitions).withColumnRenamed("id", "cid")
    s = F.lit(seed)

    # Turns per conversation: 2..2*mean; every 37th conv single-turn;
    # conv 0 is the hot key.
    n_turns = (
        F.when(F.col("cid") == 0, F.lit(turns_mean * hot_factor))
        .when(F.col("cid") % 37 == 3, F.lit(1))
        .otherwise(2 + F.pmod(_h(s, "nt", F.col("cid")), F.lit(2 * turns_mean - 1)))
    )
    df = (
        conv.withColumn("n_turns", n_turns)
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .drop("n_turns")
    )

    cid, i = F.col("cid"), F.col("turn_idx")

    # Timestamp: closed-form, monotone in the "effective" index; ties where
    # tie_flag collapses turn i onto turn i-1's effective index.
    tie = (F.pmod(_h(s, "tie", cid, i), F.lit(13)) == 0) & (i > 0)
    eff = (i - tie.cast("int")).alias("eff")
    # A quarter of convs get a long gap at every BLOCK boundary -> sessions.
    gappy = F.pmod(_h(s, "gappy", cid), F.lit(4)) == 0
    # Every 53rd conv is zero-duration (all turns at the conv start ts).
    frozen = cid % 53 == 7
    ts_us = (
        F.lit(BASE_US)
        + cid * F.lit(7_200_000_000)  # 2 h between conv starts
        + F.when(
            frozen,
            F.lit(0),
        ).otherwise(
            eff * F.lit(STEP_US)
            + F.pmod(_h(s, "j", cid, eff), F.lit(JITTER_US))
            + F.when(gappy, (eff / F.lit(BLOCK)).cast("long") * F.lit(LONG_GAP_US)).otherwise(F.lit(0))
        )
    )

    role = (
        F.when(F.pmod(_h(s, "mono", cid), F.lit(23)) == 0, F.lit("assistant"))
        .when(F.pmod(_h(s, "role", cid, i), F.lit(10)) <= 4, F.lit("user"))
        .when(F.pmod(_h(s, "role", cid, i), F.lit(10)) <= 8, F.lit("assistant"))
        .otherwise(F.lit("system"))
    )

    text = F.when(F.pmod(_h(s, "empty", cid, i), F.lit(29)) == 0, F.lit("")).otherwise(
        F.substring(
            F.lit(_VOCAB * 3), (F.pmod(_h(s, "off", cid, i), F.lit(80)) + 1).cast("int"),
            (1 + F.pmod(_h(s, "len", cid, i), F.lit(160))).cast("int"),
        )
    )

    tool = F.when(
        F.pmod(_h(s, "hastool", cid, i), F.lit(3)) == 0,
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(_h(s, "tool", cid, i), F.lit(len(_TOOLS))) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    return df.select(
        F.format_string("conv%08d", cid).alias("conv_id"),
        i.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_micros(ts_us.cast("long")).alias("ts"),
    )


def synth_probes(
    spark: SparkSession,
    n_convs: int = 200,
    probes_per_entity: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Entity x timestamp probe table for the as-of join.

    Includes probes before conv start (null vector expected), probes exactly
    equal to a turn ts (strict `<` leakage check — same closed form as
    ``synth_transcripts``), and ghost entities with no transcript rows.
    """
    s = F.lit(seed)
    base = spark.range(n_convs + 5).withColumnRenamed("id", "cid")  # +5 ghosts
    df = base.withColumn("pidx", F.explode(F.sequence(F.lit(0), F.lit(probes_per_entity - 1))))
    cid, p = F.col("cid"), F.col("pidx")

    conv_start = F.lit(BASE_US) + cid * F.lit(7_200_000_000)
    # probe 0: before any turn; probe 1: exactly a turn's nominal eff-ts
    # (eff index p*3, no jitter -> equals a real ts only for frozen convs and
    # jitter==0 turns; still exercises the equality path combined with ties);
    # others: spread across the conv.
    eff_hit = (p * 3).cast("long")
    probe_us = (
        F.when(p == 0, conv_start - F.lit(60_000_000))
        .when(
            p == 1,
            conv_start + eff_hit * F.lit(STEP_US)
            + F.pmod(_h(s, "j", cid, eff_hit), F.lit(JITTER_US)),
        )
        .otherwise(conv_start + p.cast("long") * F.lit(STEP_US) * 7 + F.pmod(_h(s, "p", cid, p), F.lit(STEP_US * 20)))
    )
    return df.select(
        F.format_string("conv%08d", cid).alias("entity_id"),
        F.timestamp_micros(probe_us.cast("long")).alias("probe_ts"),
    )
