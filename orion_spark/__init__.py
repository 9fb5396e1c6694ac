"""orion_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of RobokopU24/ORION.

ORION (reference, read-only at /root/reference) is a row-at-a-time Python
ETL system that ingests heterogeneous sources into a property-graph "KGX"
representation, normalizes identifiers/predicates, merges sources with
property-level merge semantics, derives secondary graphs and QC/meta
summaries, and writes graph sinks.

This package re-expresses every operator Spark-first: declarative DataFrame
plans optimized by Catalyst, shuffle-based sort/hash aggregation instead of
hand-built external merge (reference: orion/merging.py:238-487), broadcast
dimension joins instead of dict lookups, and Structured Streaming for the
event-stream extension. No code is ported from the reference; only the
semantics are.
"""

__version__ = "0.1.0"

from orion_spark.session import get_spark  # noqa: F401
