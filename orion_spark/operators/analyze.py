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


def spo_type_counts(
    edges: DataFrame,
    nodes: DataFrame,
    n_nodes: int | None = None,
    broadcast_max_nodes: int = 32_000_000,
) -> DataFrame:
    """J6 + A9: (subject-category, predicate, object-category) triple counts.

    Scale strategy (the r6 sf10 stage metrics showed this census paying
    ~3.6 GB of shuffle — most of the metadata_sidecars phase — when the
    endpoint joins sort-merge): the category vocabulary is bounded (the
    biolink model), so categories are dictionary-encoded through a
    broadcast literal map before anything shuffles. The node->category
    relation is the only graph-sized dimension; KG node sets run 1e6-1e8
    while edge sets run 1e8-1e10, so when the node count is within
    `broadcast_max_nodes` the compact (id, int-code) map is BROADCAST to
    both endpoint joins and the edge set never shuffles at all. Above the
    cap, a slim sort-merge path ships only (subject, object, int codes) —
    roughly half the bytes of joining raw category/predicate strings.
    Exact either way; `n_nodes` lets callers that already know the node
    count (the sidecar writer observes it during the bundle write) skip
    the extra count job.
    """
    first_cat = F.col("category").getItem(0)
    cat_vocab = sorted(
        r[0] for r in nodes.select(first_cat).distinct().collect() if r[0] is not None
    )
    code_of = F.create_map(
        *[F.lit(x) for c, i in ((c, i) for i, c in enumerate(cat_vocab)) for x in (c, i)]
    ) if cat_vocab else F.create_map().cast("map<string,int>")
    name_of = F.create_map(
        *[F.lit(x) for i, c in enumerate(cat_vocab) for x in (i, c)]
    ) if cat_vocab else F.create_map().cast("map<int,string>")
    cat = nodes.select(
        F.col(NODE_ID).alias("_cid"),
        F.element_at(code_of, first_cat).alias("_ccode"),
    )
    if n_nodes is None:
        n_nodes = nodes.count()
    if n_nodes <= broadcast_max_nodes:
        cat = F.broadcast(cat)
        e = edges.select(SUBJECT, OBJECT, PREDICATE)
    else:
        # slim shuffle path: predicate dictionary-encoded too (vocab-sized
        # collect), so the two sort-merge joins ship int codes + id strings
        pred_vocab = sorted(
            r[0] for r in edges.select(PREDICATE).distinct().collect()
            if r[0] is not None
        )
        pcode_of = F.create_map(
            *[F.lit(x) for i, p in enumerate(pred_vocab) for x in (p, i)]
        ) if pred_vocab else F.create_map().cast("map<string,int>")
        pname_of = F.create_map(
            *[F.lit(x) for i, p in enumerate(pred_vocab) for x in (i, p)]
        ) if pred_vocab else F.create_map().cast("map<int,string>")
        e = edges.select(
            SUBJECT, OBJECT, F.element_at(pcode_of, F.col(PREDICATE)).alias("_pcode")
        )
    s = cat.withColumnRenamed("_ccode", "_scode").withColumnRenamed("_cid", "_sid")
    o = cat.withColumnRenamed("_ccode", "_ocode").withColumnRenamed("_cid", "_oid")
    joined = (
        e.join(s, e[SUBJECT] == F.col("_sid"), "inner")
        .join(o, e[OBJECT] == F.col("_oid"), "inner")
    )
    if n_nodes <= broadcast_max_nodes:
        grouped = joined.groupBy("_scode", PREDICATE, "_ocode").agg(
            F.count("*").alias("n")
        )
        return grouped.select(
            F.element_at(name_of, F.col("_scode")).alias("subject_category"),
            PREDICATE,
            F.element_at(name_of, F.col("_ocode")).alias("object_category"),
            "n",
        )
    grouped = joined.groupBy("_scode", "_pcode", "_ocode").agg(
        F.count("*").alias("n")
    )
    return grouped.select(
        F.element_at(name_of, F.col("_scode")).alias("subject_category"),
        F.element_at(pname_of, F.col("_pcode")).alias(PREDICATE),
        F.element_at(name_of, F.col("_ocode")).alias("object_category"),
        "n",
    )


def knowledge_source_breakdown(edges: DataFrame) -> DataFrame:
    """Per (aggregator-set, primary-source): edge count + distinct node count
    (orion/kgx_validation.py:120-204).

    The distinct-node census runs as explode -> two-phase count_distinct
    instead of collect_list'ing every (subject, object) pair through the
    shuffle: collect_list partials ARE the full lists (no map-side
    collapse — at sf10 this was most of the sidecar phase's shuffle when
    an aggregator column is present), while partial-distinct collapses
    repeated nodes inside each map partition before anything ships. Same
    exact result (count_distinct ignores NULLs, as does the DuckDB
    oracle's list_distinct)."""
    agg_key = F.coalesce(
        F.array_join(F.array_sort(F.col("aggregator_knowledge_source")), ","),
        F.lit(""),
    )
    group = ["aggregator_sources", "primary_knowledge_source"]
    proj = edges.select(
        agg_key.alias("aggregator_sources"),
        F.col("primary_knowledge_source"),
        SUBJECT,
        OBJECT,
    )
    n_edges = proj.groupBy(*group).agg(F.count("*").alias("n_edges"))
    n_nodes = (
        proj.select(*group, F.explode(F.array(SUBJECT, OBJECT)).alias("_node"))
        .groupBy(*group)
        .agg(F.count_distinct("_node").cast("int").alias("n_distinct_nodes"))
    )
    # both sides are vocabulary-sized after their aggregates; the join is
    # trivial (AQE broadcasts it)
    return n_edges.join(n_nodes, group, "inner")


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
    # the fwd/rev union references the edge frame twice and Spark shares
    # no subtrees across union branches — for derived edge tables (the
    # KGX build chain) each branch re-ran the whole derivation including
    # its dedup exchange (round 11, measured: two ~1.5 s derivation map
    # stages per query). Materialize the three needed columns once.
    edges = edges.select(SUBJECT, OBJECT, PREDICATE).localCheckpoint(
        eager=True
    )
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
    # same fan-out as adjacency() above: materialize the edge projection
    # once instead of re-deriving it per union branch (round 11)
    edges = edges.select(SUBJECT, OBJECT, PREDICATE).localCheckpoint(
        eager=True
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
