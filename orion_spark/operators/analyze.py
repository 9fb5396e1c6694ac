"""Graph analytics / QC operators (SURVEY §2.3 A7-A12, §2.4 J6).

Each reference scan-and-count pass (orion/kgx_validation.py:44-204,
orion/meta_kg.py:50-187, orion/answercoalesce_build.py:57-165) becomes a
single declarative groupBy/agg plan. Where the reference re-reads the file
per statistic, Spark computes several aggregates in one shuffle, and all of
them are partial-aggregatable (map-side combine) so they scale linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orion_spark.model import NODE_ID, OBJECT, PREDICATE, SUBJECT


# ---------------------------------------------------------------------------
# A9: QC aggregations (orion/kgx_validation.py:44-204)
# ---------------------------------------------------------------------------

def curie_prefix_counts(nodes: DataFrame) -> DataFrame:
    """Node-id CURIE prefix histogram."""
    return (
        nodes.select(F.split(F.col(NODE_ID), ":").getItem(0).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("n"))
    )


def predicate_counts(edges: DataFrame) -> DataFrame:
    """Edge count per predicate."""
    return edges.groupBy(PREDICATE).agg(F.count("*").alias("n"))


def publications_per_predicate(edges: DataFrame) -> DataFrame:
    """Total publication references per predicate
    (orion/kgx_validation.py publications tally)."""
    return edges.groupBy(PREDICATE).agg(
        F.sum(
            F.when(F.col("publications").isNotNull(), F.size("publications")).otherwise(0)
        ).alias("n_publications")
    )


def spo_type_counts(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """J6 + A9: (subject-category, predicate, object-category) triple counts.
    Node categories looked up by joining the node projection twice; the
    projection is two columns wide so it broadcasts when nodes are small and
    shuffle-hash-joins otherwise (Catalyst + AQE decide).
    """
    cat = nodes.select(
        F.col(NODE_ID).alias("_cid"),
        F.col("category").getItem(0).alias("_cat"),
    )
    s = cat.withColumnRenamed("_cat", "subject_category").withColumnRenamed("_cid", "_sid")
    o = cat.withColumnRenamed("_cat", "object_category").withColumnRenamed("_cid", "_oid")
    return (
        edges.join(s, edges[SUBJECT] == F.col("_sid"), "inner")
        .join(o, edges[OBJECT] == F.col("_oid"), "inner")
        .groupBy("subject_category", PREDICATE, "object_category")
        .agg(F.count("*").alias("n"))
    )


def knowledge_source_breakdown(edges: DataFrame) -> DataFrame:
    """Per (aggregator-set, primary-source): edge count + distinct node count
    (orion/kgx_validation.py:120-204)."""
    agg_key = F.coalesce(
        F.array_join(F.array_sort(F.col("aggregator_knowledge_source")), ","),
        F.lit(""),
    )
    return (
        edges.select(
            agg_key.alias("aggregator_sources"),
            F.col("primary_knowledge_source"),
            SUBJECT,
            OBJECT,
        )
        .groupBy("aggregator_sources", "primary_knowledge_source")
        .agg(
            F.count("*").alias("n_edges"),
            F.size(
                F.array_distinct(
                    F.flatten(F.collect_list(F.array(SUBJECT, OBJECT)))
                )
            ).alias("n_distinct_nodes"),
        )
    )


def node_category_counts(nodes: DataFrame) -> DataFrame:
    """A8-style category histogram: explode the category array
    (orion/answercoalesce_build.py:100-165, orion/kgx_validation.py)."""
    return (
        nodes.select(F.explode("category").alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# A7/A8: AnswerCoalesce adjacency + backlinks
# ---------------------------------------------------------------------------

def adjacency(edges: DataFrame, symmetric_predicates: frozenset[str] = frozenset()) -> DataFrame:
    """A7: per node, the list of (neighbor, predicate, is_subject) structs
    (orion/answercoalesce_build.py:107-160). Symmetric predicates are
    emitted in both directions."""
    fwd = edges.select(
        F.col(SUBJECT).alias("node"),
        F.col(OBJECT).alias("neighbor"),
        F.col(PREDICATE).alias("predicate"),
        F.lit(True).alias("is_subject"),
    )
    rev = edges.select(
        F.col(OBJECT).alias("node"),
        F.col(SUBJECT).alias("neighbor"),
        F.col(PREDICATE).alias("predicate"),
        F.lit(False).alias("is_subject"),
    )
    both = fwd.unionByName(rev)
    return both.groupBy("node").agg(
        F.array_sort(
            F.collect_list(F.struct("neighbor", "predicate", "is_subject"))
        ).alias("links")
    )


def backlinks(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """A8: count by (node, predicate, direction, neighbor-leading-category)
    (orion/answercoalesce_build.py:100-165)."""
    cat = nodes.select(
        F.col(NODE_ID).alias("_cid"), F.col("category").getItem(0).alias("_cat")
    )
    fwd = edges.select(
        F.col(SUBJECT).alias("node"),
        F.col(PREDICATE).alias("predicate"),
        F.lit("out").alias("direction"),
        F.col(OBJECT).alias("_nbr"),
    )
    rev = edges.select(
        F.col(OBJECT).alias("node"),
        F.col(PREDICATE).alias("predicate"),
        F.lit("in").alias("direction"),
        F.col(SUBJECT).alias("_nbr"),
    )
    return (
        fwd.unionByName(rev)
        .join(cat, F.col("_nbr") == F.col("_cid"), "inner")
        .groupBy("node", "predicate", "direction", F.col("_cat").alias("neighbor_category"))
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# A10: meta-knowledge-graph
# ---------------------------------------------------------------------------

def meta_kg_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """A10: per (subject-type, predicate, object-type): edge count, qualifier
    value sets, and a deterministic first example edge
    (orion/meta_kg.py:50-187). 'First seen' is made deterministic with a
    row_number window ordered by the edge key columns (the reference's
    file-order 'first' is not reproducible under parallelism).

    The category map is materialized with localCheckpoint (eager): it
    feeds TWO broadcast builds (subject side and object side), and each
    build would otherwise re-scan the full node union. localCheckpoint
    (not .persist()) so blocks release on GC instead of accumulating
    across invocations in a long-lived session."""
    cat = nodes.select(
        F.col(NODE_ID).alias("_cid"), F.col("category").getItem(0).alias("_cat")
    ).localCheckpoint(eager=True)
    s = cat.withColumnRenamed("_cat", "subject_type").withColumnRenamed("_cid", "_sid")
    o = cat.withColumnRenamed("_cat", "object_type").withColumnRenamed("_cid", "_oid")
    typed = (
        edges.join(s, edges[SUBJECT] == F.col("_sid"), "inner")
        .join(o, edges[OBJECT] == F.col("_oid"), "inner")
        .drop("_sid", "_oid")
    )
    # 'first example' = lexicographic min of (subject, object): a plain
    # min(struct) aggregate — partial-aggregatable, ONE shuffle. (A window +
    # row_number would shuffle twice and materialize ranks for every row.)
    return typed.groupBy("subject_type", PREDICATE, "object_type").agg(
        F.count("*").alias("n_edges"),
        F.min(F.struct(SUBJECT, OBJECT)).alias("example"),
    )


def meta_kg_nodes(nodes: DataFrame) -> DataFrame:
    """A10 node side: per leading category, distinct id-prefix set
    (orion/meta_kg.py:50-99)."""
    return (
        nodes.select(
            F.col("category").getItem(0).alias("category"),
            F.split(F.col(NODE_ID), ":").getItem(0).alias("prefix"),
        )
        .groupBy("category")
        .agg(
            F.array_sort(F.collect_set("prefix")).alias("id_prefixes"),
            F.count("*").alias("n_nodes"),
        )
    )


# ---------------------------------------------------------------------------
# A12: schema inference scan
# ---------------------------------------------------------------------------

WIDENING = {
    frozenset(["bigint", "double"]): "double",
    frozenset(["int", "double"]): "double",
    frozenset(["int", "bigint"]): "bigint",
}


def infer_property_schema(df: DataFrame, core: list[str]) -> list[tuple[str, str]]:
    """A12: property -> resolved type via the widening lattice
    (int+float->float, any-list->string[], else string)
    (orion/kgx_file_converter.py:224-305).

    Spark's schema IS the inferred schema after a json read; for an
    already-typed DataFrame this simply reports the property tail, applying
    the same lattice naming. Returns [(property, type_string)].
    """
    out = []
    for f in df.schema.fields:
        if f.name in core:
            continue
        dt = f.dataType.simpleString()
        if dt.startswith("array"):
            inner = dt[len("array<"):-1]
            out.append((f.name, f"{inner}[]"))
        else:
            out.append((f.name, dt))
    return sorted(out)


def bundle_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...] = ("subject", "predicate", "object"),
) -> DataFrame:
    """Release-to-release bundle diff: per entity key, whether it was
    added, removed, or kept between two builds (the QC companion to the
    content-addressed versioning in plans/pipeline.py — the reference
    records release metadata but cannot answer "what changed").

    Scale shape: both sides reduce to DISTINCT keys before the full-outer
    join, so the shuffle carries keys only — no properties; the join is
    key-partitioned on both sides (co-partitioned if the bundles are
    bucketed, see sources/bucketing.py).
    """
    keys = list(key_cols)
    o = old.select(*keys).distinct().withColumn("_in_old", F.lit(1))
    n = new.select(*keys).distinct().withColumn("_in_new", F.lit(1))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(*keys, status.alias("status"))
