"""Declarative source extraction (SURVEY §2.2 P1-P5, P10; reference
orion/extractor.py:26-190).

The reference drives per-source parsers through per-row Python lambdas that
emit subject/object ids, predicates and property dicts. Here each parser is
an ExtractSpec of *column expressions*; the extractor is a single select /
explode plan that Catalyst fuses into the scan (predicate pushdown + column
pruning reach the csv/json/jdbc reader — nothing is materialized row-side).

A spec yields the three KGX outputs of a parse stage: subject nodes, object
nodes, edges — the same contract as orion/loader_interface.py:65-115.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orion_spark.model import DEFAULT_NODE_CATEGORY


@dataclass
class ExtractSpec:
    """Column-expression extraction spec (the declarative analogue of the
    reference's lambda bundle, orion/extractor.py:103-124 /
    parsers/_parser_template/src/parser.py:57-81)."""

    subject_id: Column
    object_id: Column
    # one edge per predicate expression; a row with zero non-null predicates
    # is "unconnected" (P5)
    predicates: list[Column]
    subject_name: Column | None = None
    object_name: Column | None = None
    subject_categories: list[str] = field(default_factory=lambda: [DEFAULT_NODE_CATEGORY])
    object_categories: list[str] = field(default_factory=lambda: [DEFAULT_NODE_CATEGORY])
    subject_properties: dict[str, Column] = field(default_factory=dict)
    object_properties: dict[str, Column] = field(default_factory=dict)
    edge_properties: dict[str, Column] = field(default_factory=dict)
    primary_knowledge_source: str | None = None
    # P3: keep rows where column value ∈ set (orion/extractor.py:51-54)
    row_filter: Column | None = None


def extract(
    df: DataFrame, spec: ExtractSpec, exclude_unconnected: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run a spec: returns (subject_nodes, object_nodes, edges).

    P4 multi-predicate fan-out = explode over the predicate array;
    P5 unconnected drop = filter on non-empty predicate set.
    """
    if spec.row_filter is not None:
        df = df.where(spec.row_filter)

    preds = F.array_compact(F.array(*spec.predicates)) if spec.predicates else F.array()
    base = df.withColumn("_preds", preds)
    connected = base.where(F.size("_preds") > 0) if exclude_unconnected else base

    def _nodes(id_expr, name_expr, cats, props):
        cols = [
            id_expr.alias("id"),
            (name_expr if name_expr is not None else F.lit(None).cast("string")).alias(
                "name"
            ),
            F.array(*[F.lit(c) for c in cats]).alias("category"),
        ]
        cols += [expr.alias(name) for name, expr in sorted(props.items())]
        src = connected if exclude_unconnected else base
        return src.select(*cols).where(F.col("id").isNotNull()).dropDuplicates(["id"])

    subject_nodes = _nodes(
        spec.subject_id, spec.subject_name, spec.subject_categories,
        spec.subject_properties,
    )
    object_nodes = _nodes(
        spec.object_id, spec.object_name, spec.object_categories,
        spec.object_properties,
    )

    edge_cols = [
        spec.subject_id.alias("subject"),
        F.explode("_preds").alias("predicate"),
        spec.object_id.alias("object"),
        F.lit(spec.primary_knowledge_source).alias("primary_knowledge_source"),
    ]
    edge_cols += [expr.alias(name) for name, expr in sorted(spec.edge_properties.items())]
    edges = connected.select(*edge_cols).where(
        F.col("subject").isNotNull() & F.col("object").isNotNull()
    )
    return subject_nodes, object_nodes, edges


def predicate_remap(col: Column, mapping: dict[str, str], default: str | None = None) -> Column:
    """P10: static source-vocab -> biolink predicate map as a literal map
    lookup (orion/predicates.py:7-55) — broadcast-free, codegen-friendly."""
    pairs = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    m = F.create_map(*pairs)
    looked = F.element_at(m, col)
    return F.coalesce(looked, F.lit(default)) if default is not None else looked


def hgvs_from_coords(
    chrom: Column, pos: Column, ref: Column, alt: Column, assembly_prefix: str = "NC_0000"
) -> Column:
    """P11: chrom/pos/ref/alt -> HGVS SNV/del/ins/delins expression
    (orion/hgvs_utils.py:34-111) as pure column logic."""
    chrom_num = F.lpad(chrom.cast("string"), 2, "0")
    accession = F.concat(F.lit(assembly_prefix), chrom_num)
    ref_len = F.length(ref)
    alt_len = F.length(alt)
    snv = F.concat(pos.cast("string"), ref, F.lit(">"), alt)
    dele = F.concat((pos + 1).cast("string"), F.lit("_"), (pos + ref_len - 1).cast("string"), F.lit("del"))
    ins = F.concat(pos.cast("string"), F.lit("_"), (pos + 1).cast("string"),
                   F.lit("ins"), F.substring(alt, 2, 10_000))
    delins = F.concat(pos.cast("string"), F.lit("_"), (pos + ref_len - 1).cast("string"),
                      F.lit("delins"), alt)
    variant = (
        F.when((ref_len == 1) & (alt_len == 1), snv)
        .when((ref_len > 1) & (alt_len == 1) & (F.substring(ref, 1, 1) == F.substring(alt, 1, 1)), dele)
        .when((ref_len == 1) & (alt_len > 1) & (F.substring(ref, 1, 1) == F.substring(alt, 1, 1)), ins)
        .otherwise(delins)
    )
    return F.concat(accession, F.lit(":g."), variant)
