"""Key canonicalization + hash parity (reference: TestNormalization /
TestTuple2Hash, test_flow_feature.py:12-80, 297-317)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flow_feature_spark.keys import normalize_endpoints, tuple_hash_col


def _normalize(spark, src, sport, dst, dport):
    df = spark.createDataFrame(
        [(src, sport, dst, dport)], "src string, sport int, dst string, dport int"
    )
    row = df.select(
        normalize_endpoints(F.col("src"), F.col("sport"), F.col("dst"), F.col("dport")).alias("n")
    ).collect()[0]["n"]
    return (row["src"], row["sport"], row["dst"], row["dport"])


def test_normalization_swap_when_sport_lower(spark):
    assert _normalize(spark, "1.2.3.4", 80, "5.6.7.8", 12345) == ("5.6.7.8", 12345, "1.2.3.4", 80)


def test_normalization_keep_when_sport_higher(spark):
    assert _normalize(spark, "1.2.3.4", 12345, "5.6.7.8", 80) == ("1.2.3.4", 12345, "5.6.7.8", 80)


def test_normalization_port_tie_larger_ip_first(spark):
    # dot-stripped integer compare (flow.py:228-230)
    assert _normalize(spark, "10.0.0.1", 99, "10.0.0.2", 99) == ("10.0.0.2", 99, "10.0.0.1", 99)
    assert _normalize(spark, "10.0.0.2", 99, "10.0.0.1", 99) == ("10.0.0.2", 99, "10.0.0.1", 99)


def test_tuple_hash_matches_sha256_no_separator(spark):
    df = spark.createDataFrame(
        [("1.2.3.4", 443, "5.6.7.8", 8080)], "src string, sport int, dst string, dport int"
    )
    got = df.select(
        tuple_hash_col(F.col("src"), F.col("sport"), F.col("dst"), F.col("dport")).alias("h")
    ).collect()[0]["h"]
    expected = hashlib.sha256("1.2.3.44435.6.7.88080TCP".encode()).hexdigest()
    assert got == expected
    assert len(got) == 64


def test_tuple_hash_order_sensitive(spark):
    df = spark.createDataFrame(
        [("1.2.3.4", 443, "5.6.7.8", 8080)], "src string, sport int, dst string, dport int"
    )
    h1, h2 = df.select(
        tuple_hash_col(F.col("src"), F.col("sport"), F.col("dst"), F.col("dport")).alias("a"),
        tuple_hash_col(F.col("dst"), F.col("dport"), F.col("src"), F.col("sport")).alias("b"),
    ).collect()[0]
    assert h1 != h2
