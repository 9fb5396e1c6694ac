"""Graph metadata / QC / schema sinks (SURVEY §2.1 K7, §2.3 A9/A12).

The reference writes graph-metadata.json, qc-results.json and schema.json by
scanning the jsonl files (orion/kgx_metadata.py:150-290,375-460,
orion/kgx_validation.py:25-204). Here: the aggregates run as one Spark job
each, results are collected (they are tiny) and dumped as JSON driver-side.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orion_spark.operators.analyze import (
    curie_prefix_counts,
    infer_property_schema,
    knowledge_source_breakdown,
    predicate_counts,
    spo_type_counts,
)
from orion_spark.model import EDGE_CORE_COLUMNS, NODE_CORE_COLUMNS


def qc_results(nodes: DataFrame, edges: DataFrame) -> dict:
    """A9 QC aggregate panel (orion/kgx_validation.py:44-204)."""
    return {
        "node_curie_prefixes": {
            r["prefix"]: r["n"] for r in curie_prefix_counts(nodes).collect()
        },
        "edge_properties": sorted(edges.columns),
        "predicate_totals": {
            r["predicate"]: r["n"] for r in predicate_counts(edges).collect()
        },
        "edges_per_knowledge_source": [
            row.asDict() for row in knowledge_source_breakdown(edges).collect()
        ]
        if "aggregator_knowledge_source" in edges.columns
        else [],
    }


INFORES_STATUS_DEPRECATED = "deprecated"
INFORES_STATUS_INVALID = "invalid"


def validate_graph(
    nodes: DataFrame,
    edges: DataFrame,
    infores_status: dict[str, str] | None = None,
    valid_node_types: set[str] | None = None,
) -> dict:
    """The validation VERDICT layer on top of the QC counts
    (orion/kgx_validation.py:25-204): a pass/warnings/errors record that
    flags deprecated or invalid knowledge-source infores identifiers and
    node categories outside the model.

    `infores_status` maps infores id -> status (the reference resolves
    this from the biolink infores catalog via bmt; here it is an
    injectable snapshot, same treatment as the closure dimension tables
    in operators/derive.py — unknown ids count as valid, matching the
    reference's get_infores_status default). `valid_node_types` is the
    category vocabulary; None skips that check.

    Scale shape: the graph-sized work is two distinct-aggregates
    (knowledge sources incl. the missing-pks default, exploded node
    categories) whose results are vocabulary-sized; the verdict itself
    is a driver-side set comparison. Edges/nodes are never collected."""
    infores_status = infores_status or {}
    ks = edges.select(
        F.coalesce(
            F.col("primary_knowledge_source"),
            F.lit("missing_primary_knowledge_source"),
        ).alias("ks")
    )
    if "aggregator_knowledge_source" in edges.columns:
        ks = ks.unionByName(
            edges.select(F.explode("aggregator_knowledge_source").alias("ks"))
        )
    sources = {r.ks for r in ks.distinct().collect()}
    warnings: dict[str, list] = {}
    deprecated = sorted(
        s for s in sources
        if infores_status.get(s) == INFORES_STATUS_DEPRECATED
    )
    invalid = sorted(
        s for s in sources if infores_status.get(s) == INFORES_STATUS_INVALID
    )
    if deprecated:
        warnings["deprecated_knowledge_sources"] = deprecated
    if invalid:
        warnings["invalid_knowledge_sources"] = invalid
    if valid_node_types is not None and "category" in nodes.columns:
        cats = {
            r.c
            for r in nodes.select(F.explode("category").alias("c"))
            .distinct()
            .collect()
        }
        invalid_types = sorted(cats - set(valid_node_types))
        if invalid_types:
            warnings["invalid_node_types"] = invalid_types
    return {
        "pass": True,  # warnings never fail the build (kgx_validation.py:36)
        "warnings": warnings,
        "errors": {},
        **qc_results(nodes, edges),
    }


def graph_metadata(
    graph_id: str,
    graph_version: str,
    nodes: DataFrame,
    edges: DataFrame,
    node_count: int | None = None,
    edge_count: int | None = None,
) -> dict:
    """graph-metadata.json content (orion/kgx_metadata.py:150-290): counts +
    spo-type census. ``node_count``/``edge_count`` skip the re-scan jobs
    when the caller already observed them during the bundle write; the
    node count also feeds the census's broadcast-vs-sort-merge decision."""
    if node_count is None:
        node_count = nodes.count()
    if edge_count is None:
        edge_count = edges.count()
    return {
        "graph_id": graph_id,
        "graph_version": graph_version,
        "node_count": node_count,
        "edge_count": edge_count,
        "spo_type_counts": [
            row.asDict()
            for row in spo_type_counts(edges, nodes, n_nodes=node_count).collect()
        ],
    }


def kgx_schema(nodes: DataFrame, edges: DataFrame) -> dict:
    """schema.json content (orion/kgx_metadata.py:375-443): property->type
    from the (already known) DataFrame schema instead of a rescan."""
    return {
        "nodes": dict(infer_property_schema(nodes, NODE_CORE_COLUMNS)),
        "edges": dict(infer_property_schema(edges, EDGE_CORE_COLUMNS)),
    }


def write_metadata_sidecars(
    graph_id: str,
    graph_version: str,
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    infores_status: dict[str, str] | None = None,
    valid_node_types: set[str] | None = None,
    node_count: int | None = None,
    edge_count: int | None = None,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "graph-metadata.json"), "w") as fh:
        json.dump(
            graph_metadata(
                graph_id, graph_version, nodes, edges,
                node_count=node_count, edge_count=edge_count,
            ),
            fh, indent=2,
        )
    # qc-results.json carries the full verdict record (pass/warnings/
    # errors + counts), matching the reference's qc shape
    with open(os.path.join(out_dir, "qc-results.json"), "w") as fh:
        json.dump(
            validate_graph(nodes, edges, infores_status, valid_node_types),
            fh, indent=2,
        )
    with open(os.path.join(out_dir, "schema.json"), "w") as fh:
        json.dump(kgx_schema(nodes, edges), fh, indent=2)


def write_merge_sidecar(report: dict, out_dir: str) -> None:
    """merge-metadata.json (orion/kgx_file_merger.py:84-100 merge_metadata:
    source vs final counts, merged-away counts per stage). The report dict
    comes from operators/metrics.merge_report."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "merge-metadata.json"), "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)


def write_normalization_sidecar(report: dict, out_dir: str) -> None:
    """normalization-metadata.json (orion/kgx_file_normalizer.py:355-364:
    source_edges / edge_splits / final counts + per-prefix stats). The
    report dict comes from operators/metrics.normalization_report."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "normalization-metadata.json"), "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
