"""Self-reported pipeline metrics (BASELINE.md implication: the engine
should report the counters ORION tracks as metadata — merge counts
(orion/kgx_file_merger.py:84-100), normalization success/failure/split
counts (orion/kgx_file_normalizer.py:204-221,355-364), per-prefix stats
(366-401)).

Each report is a handful of small aggregates collected driver-side; the
heavy inputs are only scanned, never materialized to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from orion_spark.model import NODE_ID, OBJECT, SUBJECT
from orion_spark.operators.normalize import prefix_stats


def merge_report(raw_nodes: DataFrame, merged_nodes: DataFrame,
                 raw_edges: DataFrame, merged_edges: DataFrame) -> dict:
    """Counts before/after the merge stage (orion/kgx_file_merger.py:84-100
    tracks source/merged counts per source)."""
    rn, mn = raw_nodes.count(), merged_nodes.count()
    re_, me = raw_edges.count(), merged_edges.count()
    return {
        "source_nodes": rn,
        "merged_nodes": mn,
        "nodes_merged_away": rn - mn,
        "source_edges": re_,
        "merged_edges": me,
        "edges_merged_away": re_ - me,
    }


def normalization_report(
    nodes: DataFrame, edges: DataFrame, norm_map: DataFrame
) -> dict:
    """Success / failure / split counters for a normalization pass
    (orion/kgx_file_normalizer.py:204-221 node side, 355-364 edge splits)."""
    ok = norm_map.where(F.size("normalized_ids") > 0)
    joined = nodes.select(NODE_ID).join(
        broadcast(norm_map), nodes[NODE_ID] == norm_map["original_id"], "left"
    )
    hit = joined["original_id"].isNotNull() & (F.size("normalized_ids") > 0)
    node_counts = joined.agg(
        F.count("*").alias("total"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("normalized"),
        F.sum(F.when(hit & (F.size("normalized_ids") > 1), 1).otherwise(0)).alias(
            "split"
        ),
    ).collect()[0]

    smap = broadcast(ok.select(F.col("original_id").alias("_s"),
                               F.size("normalized_ids").alias("_sn")))
    omap = broadcast(ok.select(F.col("original_id").alias("_o"),
                               F.size("normalized_ids").alias("_on")))
    e = (
        edges.select(SUBJECT, OBJECT)
        .join(smap, edges[SUBJECT] == F.col("_s"), "left")
        .join(omap, edges[OBJECT] == F.col("_o"), "left")
    )
    edge_counts = e.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("_sn").isNull() | F.col("_on").isNull(), 1).otherwise(0)
        ).alias("dropped"),
        F.sum(
            F.when(
                F.col("_sn").isNotNull() & F.col("_on").isNotNull(),
                F.col("_sn") * F.col("_on"),
            ).otherwise(0)
        ).alias("output_edges"),
    ).collect()[0]

    surviving = edge_counts["total"] - int(edge_counts["dropped"])
    return {
        "nodes_total": node_counts["total"],
        "nodes_normalized": int(node_counts["normalized"]),
        "nodes_failed": node_counts["total"] - int(node_counts["normalized"]),
        "node_splits": int(node_counts["split"]),
        "edges_total": edge_counts["total"],
        "edges_dropped_missing_endpoint": int(edge_counts["dropped"]),
        "edges_after_split_fanout": int(edge_counts["output_edges"]),
        # reference invariant (kgx_file_normalizer.py:360-362):
        # source_edges - failures + splits = edges post norm
        "edge_splits": int(edge_counts["output_edges"]) - surviving,
        "prefix_stats": [r.asDict() for r in prefix_stats(nodes, norm_map).collect()],
    }


def observe_extract(df: DataFrame, name: str = "extract") -> DataFrame:
    """P9: attach row-level counters that materialize with the next action
    (Spark observe API) — the declarative version of the reference's
    load_metadata skip counts (orion/extractor.py:21,56,66). Read them from
    the observation after an action via `df.sparkSession` listeners or
    `Observation` objects in callers that need exact values."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows_out"),
    )
