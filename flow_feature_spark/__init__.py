"""flow_feature_spark — a PySpark-native point-in-time feature-engineering engine.

Built from scratch over multi-turn conversation/agent transcripts, with the query
and data-processing capabilities of the reference flow extractor
(jiangph1001/flow-feature, surveyed in SURVEY.md): each conv_id is a flow, each
turn a packet, and per-session 72-element statistical feature vectors are computed
via gap-based sessionization, windowed lag/lead/backfill features, and a
non-leaking as-of join onto entity x timestamp probes.

Architecture is Spark-first: DataFrame/SQL expressions wherever Catalyst can own
the plan, Arrow-batched pandas UDFs (``applyInPandas``) only for the grouped
vector kernel and the sort-merge as-of fast path. No RDDs, no per-row Python.
"""

__version__ = "0.1.0"

from flow_feature_spark.schema import FEATURE_NAMES  # noqa: F401
