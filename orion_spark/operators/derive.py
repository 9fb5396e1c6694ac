"""Derived-graph operators (SURVEY §2.5 H1-H4).

The reference walks the biolink ontology per edge with memoized bmt lookups
(orion/redundant_kg.py:28-31). Spark-first design: the ontology is a tiny
*dimension*, so we precompute closure/inverse tables once (driver-side or as
a static table) and expand edges with broadcast joins + explode — no UDFs,
no per-row ontology calls, and the expansion parallelizes with the edges.

closure table schema (FIXTURES.md §5):
    term STRING, ancestor STRING, is_symmetric BOOLEAN, inverse STRING
By convention the closure includes the reflexive pair (term, term) ONLY when
the caller wants the original edge re-emitted; `redundant_edges` handles
both layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from orion_spark.model import OBJECT, PREDICATE, QUALIFIER_COLUMNS, SUBJECT


def redundant_edges(
    edges: DataFrame,
    predicate_closure: DataFrame,
    include_original: bool = True,
    edges_distinct: bool = False,
) -> DataFrame:
    """H1: redundant-KG predicate closure — one edge per ancestor predicate
    (orion/redundant_kg.py:51-106).

    The closure table is broadcast; the join fans each edge out to its
    ancestor set. The qualifier-permutation part of the reference (aspect
    ancestors × direction ancestors plus the qualifier-free edge) is
    `qualifier_closure_edges` below.
    """
    closure = predicate_closure.select(
        F.col("term").alias("_t"), F.col("ancestor").alias("_anc")
    )
    if include_original:
        self_pairs = predicate_closure.select(
            F.col("term").alias("_t"), F.col("term").alias("_anc")
        )
        closure = closure.unionByName(self_pairs).distinct()
    expanded = (
        edges.join(broadcast(closure), edges[PREDICATE] == F.col("_t"), "inner")
        .withColumn(PREDICATE, F.col("_anc"))
        .drop("_t", "_anc")
    )
    if edges_distinct:
        # closure pairs are distinct, so distinct input edges can't produce
        # duplicate expansions — skip the (full-width) dedup shuffle. At
        # 100 TB that dedup would shuffle the entire expanded edge set.
        return expanded
    return expanded.dropDuplicates()


def qualifier_closure_edges(
    edges: DataFrame,
    aspect_closure: DataFrame,
    direction_closure: DataFrame | None = None,
) -> DataFrame:
    """H1 qualifier permutations: one edge per (aspect-ancestor ×
    ({∅} ∪ direction-ancestor)) combination (orion/redundant_kg.py:74-96).

    Closure tables are (term, ancestor) pairs over qualifier VALUES and are
    expected to include the reflexive (v, v) pair; the direction dimension
    additionally pairs with NULL (the direction-free variant). Broadcast
    joins — the qualifier vocabularies are tiny.
    """
    a = aspect_closure.select(
        F.col("term").alias("_at"), F.col("ancestor").alias("_aa")
    )
    out = (
        edges.join(
            broadcast(a), edges["object_aspect_qualifier"] == F.col("_at"), "inner"
        )
        .withColumn("object_aspect_qualifier", F.col("_aa"))
        .drop("_at", "_aa")
    )
    if direction_closure is not None and "object_direction_qualifier" in edges.columns:
        d = direction_closure.select(
            F.col("term").alias("_dt"), F.col("ancestor").alias("_da")
        )
        with_dir = (
            out.join(
                broadcast(d),
                out["object_direction_qualifier"] == F.col("_dt"),
                "inner",
            )
            .withColumn("object_direction_qualifier", F.col("_da"))
            .drop("_dt", "_da")
        )
        # the ∅ member: every aspect-expanded edge also emits direction-free
        no_dir = out.withColumn(
            "object_direction_qualifier", F.lit(None).cast("string")
        )
        out = with_dir.unionByName(no_dir)
    return out.dropDuplicates()


def qualifier_free_edges(edges: DataFrame) -> DataFrame:
    """H1 companion: the qualifier-free variant of every qualified edge
    (orion/redundant_kg.py:97-106 emits the edge with qualifiers removed)."""
    quals = [q for q in QUALIFIER_COLUMNS if q in edges.columns]
    if not quals:
        return edges
    out = edges
    for q in quals:
        out = out.withColumn(q, F.lit(None).cast("string"))
    return out.dropDuplicates()


def leaf_categories(
    node_categories: DataFrame, category_closure: DataFrame, id_col: str = "id",
    category_col: str = "category",
) -> DataFrame:
    """H2: reduce each node's category array to its leaf set — remove any
    category that is a strict ancestor of another category the node also has
    (orion/biolink_utils.py:44-60).

    Pure relational encoding: explode categories, anti-join each (node, cat)
    against the set of (node, strict-ancestor-of-some-other-cat), regroup.
    """
    exploded = node_categories.select(id_col, F.explode(category_col).alias("cat"))
    anc = category_closure.where(F.col("term") != F.col("ancestor")).select(
        F.col("term").alias("_t"), F.col("ancestor").alias("_anc")
    )
    # ancestors implied by each node's categories
    implied = (
        exploded.join(broadcast(anc), exploded["cat"] == F.col("_t"), "inner")
        .select(id_col, F.col("_anc").alias("cat"))
        .distinct()
    )
    leaves = exploded.join(implied, [id_col, "cat"], "left_anti")
    return leaves.groupBy(id_col).agg(
        F.array_sort(F.collect_set("cat")).alias("leaf_categories")
    )


def _aspect_adjust(col):
    """'abundance' -> 'abundance_of'; '*_interaction' -> '..._with'
    (orion/collapse_qualifiers.py:28-34)."""
    return F.concat(
        col,
        F.when(F.substring_index(col, "_", -1) == "interaction", "_with").otherwise(
            "_of"
        ),
    )


def collapse_qualifiers(edges: DataFrame) -> DataFrame:
    """H3: compose qualifier values into a single synthetic predicate in the
    reference's fixed semantic order (orion/collapse_qualifiers.py:55-171):

      [subj_direction] [subj_aspect+_of] [subj_form+_of] <subject_node>
      [subj_derivative] [subj_part] [qualified_predicate] [obj_direction]
      [obj_aspect+_of] [obj_form+_of] <object_node> [obj_derivative]
      [obj_part] [via_mechanism] [in_species] [anatomical(-in if species)]

    joined with '_' (concat_ws skips absent/null parts). Edges with no
    qualifiers keep their original predicate (the reference rewrites those
    too — an always-true guard at collapse_qualifiers.py:166 — but the
    intent, per its docstring, is qualifier collapse, so unqualified edges
    pass through unchanged here). Qualifier columns are dropped after.
    Pure column expressions — no UDF, no bmt calls at runtime.
    """
    cols = set(edges.columns)

    def q(name):
        return F.col(name) if name in cols else F.lit(None).cast("string")

    species_present = (
        q("species_context_qualifier").isNotNull()
        if "species_context_qualifier" in cols
        else F.lit(False)
    )
    anatomical = F.when(
        q("anatomical_context_qualifier").isNotNull() & ~species_present,
        F.concat(F.lit("in_"), q("anatomical_context_qualifier")),
    ).otherwise(q("anatomical_context_qualifier"))

    def adj(name, fn):
        return F.when(q(name).isNotNull(), fn(q(name)))

    parts = [
        q("subject_direction_qualifier"),
        adj("subject_aspect_qualifier", _aspect_adjust),
        adj("subject_form_or_variant_qualifier", lambda c: F.concat(c, F.lit("_of"))),
        F.lit("<subject_node>"),
        q("subject_derivative_qualifier"),
        q("subject_part_qualifier"),
        adj("qualified_predicate", lambda c: F.regexp_replace(c, "^biolink:", "")),
        q("object_direction_qualifier"),
        adj("object_aspect_qualifier", _aspect_adjust),
        adj("object_form_or_variant_qualifier", lambda c: F.concat(c, F.lit("_of"))),
        F.lit("<object_node>"),
        q("object_derivative_qualifier"),
        q("object_part_qualifier"),
        adj("causal_mechanism_qualifier", lambda c: F.concat(F.lit("via_"), c)),
        adj("species_context_qualifier", lambda c: F.concat(F.lit("in_"), c)),
        anatomical,
    ]
    statement = F.concat_ws("_", *parts)

    present = [F.col(c).isNotNull() for c in QUALIFIER_COLUMNS if c in cols]
    if not present:
        return edges
    has_quals = present[0]
    for c in present[1:]:
        has_quals = has_quals | c
    out = edges.withColumn(
        PREDICATE, F.when(has_quals, statement).otherwise(F.col(PREDICATE))
    )
    return out.drop(*[c for c in QUALIFIER_COLUMNS if c in cols])


def invert_edges(edges: DataFrame, inverted_col: str = "inverted") -> DataFrame:
    """H4: swap subject/object (and every original_subject*/original_object*
    prefixed pair) where the `inverted` flag is set
    (orion/kgx_file_normalizer.py:404-413).
    """
    if inverted_col not in edges.columns:
        return edges
    inv = F.col(inverted_col)
    pairs = [(SUBJECT, OBJECT)]
    if "original_subject" in edges.columns and "original_object" in edges.columns:
        pairs.append(("original_subject", "original_object"))
    out = edges
    for s, o in pairs:
        out = out.withColumn(f"_swap_{s}", F.when(inv, F.col(o)).otherwise(F.col(s)))
        out = out.withColumn(o, F.when(inv, F.col(s)).otherwise(F.col(o)))
        out = out.withColumn(s, F.col(f"_swap_{s}")).drop(f"_swap_{s}")
    return out.drop(inverted_col)


def inverse_meta_edges(edges: DataFrame, predicate_closure: DataFrame) -> DataFrame:
    """H4 meta use: emit the reverse edge for predicates with an inverse;
    symmetric predicates invert to themselves (orion/biolink_utils.py:68-80).
    Used by meta-KG expansion (orion/meta_kg.py)."""
    inv = predicate_closure.select(
        F.col("term").alias("_t"),
        F.when(F.col("is_symmetric"), F.col("term"))
        .otherwise(F.col("inverse"))
        .alias("_inv"),
    ).where(F.col("_inv").isNotNull()).distinct()
    reversed_edges = (
        edges.join(broadcast(inv), edges[PREDICATE] == F.col("_t"), "inner")
        .withColumn(PREDICATE, F.col("_inv"))
        .withColumn("_tmp", F.col(SUBJECT))
        .withColumn(SUBJECT, F.col(OBJECT))
        .withColumn(OBJECT, F.col("_tmp"))
        .drop("_t", "_inv", "_tmp")
    )
    return reversed_edges
