"""Derived-graph operator tests (SURVEY §2.5 H1-H4)."""

from pyspark.sql import Row

from orion_spark.operators import derive as D


def _closure(spark):
    return spark.createDataFrame(
        [
            Row(term="biolink:causes", ancestor="biolink:affects",
                is_symmetric=False, inverse="biolink:caused_by"),
            Row(term="biolink:affects", ancestor="biolink:related_to",
                is_symmetric=False, inverse=None),
            Row(term="biolink:causes", ancestor="biolink:related_to",
                is_symmetric=False, inverse="biolink:caused_by"),
            Row(term="biolink:interacts_with", ancestor="biolink:related_to",
                is_symmetric=True, inverse=None),
        ]
    )


def test_redundant_edges_closure(spark):
    edges = spark.createDataFrame(
        [Row(subject="A", predicate="biolink:causes", object="B",
             primary_knowledge_source="infores:x")]
    )
    out = D.redundant_edges(edges, _closure(spark))
    preds = sorted(r.predicate for r in out.collect())
    assert preds == ["biolink:affects", "biolink:causes", "biolink:related_to"]
    no_orig = D.redundant_edges(edges, _closure(spark), include_original=False)
    assert sorted(r.predicate for r in no_orig.collect()) == [
        "biolink:affects", "biolink:related_to"]


def test_leaf_categories(spark):
    nodes = spark.createDataFrame(
        [
            Row(id="N1", category=["biolink:Gene", "biolink:NamedThing"]),
            Row(id="N2", category=["biolink:NamedThing"]),
        ]
    )
    closure = spark.createDataFrame(
        [Row(term="biolink:Gene", ancestor="biolink:NamedThing",
             is_symmetric=False, inverse=None)],
        schema="term string, ancestor string, is_symmetric boolean, inverse string",
    )
    out = {r.id: r.leaf_categories for r in D.leaf_categories(nodes, closure).collect()}
    assert out["N1"] == ["biolink:Gene"]
    assert out["N2"] == ["biolink:NamedThing"]


def test_collapse_qualifiers(spark):
    edges = spark.createDataFrame(
        [
            Row(subject="A", predicate="biolink:affects", object="B",
                qualified_predicate="biolink:causes",
                object_aspect_qualifier="abundance",
                object_direction_qualifier="increased"),
            Row(subject="C", predicate="biolink:affects", object="D",
                qualified_predicate=None,
                object_aspect_qualifier=None, object_direction_qualifier=None),
        ]
    )
    out = {r.subject: r for r in D.collapse_qualifiers(edges).collect()}
    # reference order (orion/collapse_qualifiers.py): <subject_node>,
    # qualified predicate, obj direction, obj aspect(_of), <object_node>
    assert out["A"].predicate == (
        "<subject_node>_causes_increased_abundance_of_<object_node>"
    )
    assert out["C"].predicate == "biolink:affects"
    assert "object_aspect_qualifier" not in D.collapse_qualifiers(edges).columns


def test_collapse_qualifiers_full_statement(spark):
    """The reference's worked example (collapse_qualifiers.py:73 comment)."""
    edges = spark.createDataFrame(
        [
            Row(subject="UNII:7", predicate="biolink:affects", object="NCBIGene:6531",
                subject_direction_qualifier="increased",
                subject_aspect_qualifier="abundance",
                subject_form_or_variant_qualifier="mutant_form",
                subject_derivative_qualifier="transcript",
                subject_part_qualifier="polyA_tail",
                object_aspect_qualifier="activity",
                object_direction_qualifier="upregulated",
                object_form_or_variant_qualifier="wildtype_form",
                object_derivative_qualifier="protein",
                object_part_qualifier="catalytic_site",
                causal_mechanism_qualifier="phosphorylation",
                species_context_qualifier="human",
                anatomical_context_qualifier="liver",
                qualified_predicate="biolink:causes"),
        ]
    )
    out = D.collapse_qualifiers(edges).collect()[0]
    assert out.predicate == (
        "increased_abundance_of_mutant_form_of_<subject_node>_transcript_"
        "polyA_tail_causes_upregulated_activity_of_wildtype_form_of_"
        "<object_node>_protein_catalytic_site_via_phosphorylation_in_human_liver"
    )
    # interaction-suffixed aspects compose with _with, not _of
    edges2 = spark.createDataFrame(
        [Row(subject="A", predicate="p", object="B",
             object_aspect_qualifier="molecular_interaction")]
    )
    assert D.collapse_qualifiers(edges2).collect()[0].predicate == (
        "<subject_node>_molecular_interaction_with_<object_node>"
    )


def test_invert_edges(spark):
    edges = spark.createDataFrame(
        [
            Row(subject="A", predicate="biolink:causes", object="B",
                original_subject="a0", original_object="b0", inverted=True),
            Row(subject="C", predicate="biolink:causes", object="D",
                original_subject="c0", original_object="d0", inverted=False),
        ]
    )
    out = {r.predicate + r.subject: r for r in D.invert_edges(edges).collect()}
    swapped = [r for r in D.invert_edges(edges).collect() if r.subject == "B"][0]
    assert swapped.object == "A"
    assert swapped.original_subject == "b0" and swapped.original_object == "a0"
    kept = [r for r in D.invert_edges(edges).collect() if r.subject == "C"][0]
    assert kept.object == "D"
    assert "inverted" not in D.invert_edges(edges).columns


def test_inverse_meta_edges(spark):
    edges = spark.createDataFrame(
        [
            Row(subject="A", predicate="biolink:causes", object="B"),
            Row(subject="X", predicate="biolink:interacts_with", object="Y"),
            Row(subject="P", predicate="biolink:no_inverse", object="Q"),
        ]
    )
    out = D.inverse_meta_edges(edges, _closure(spark)).collect()
    by_pred = {r.predicate: r for r in out}
    assert by_pred["biolink:caused_by"].subject == "B"
    assert by_pred["biolink:interacts_with"].subject == "Y"  # symmetric self-inverse
    assert len(out) == 2  # no_inverse dropped


def test_qualifier_free_edges(spark):
    edges = spark.createDataFrame(
        [
            Row(subject="A", predicate="p", object="B",
                object_aspect_qualifier="abundance", qualified_predicate="qp",
                object_direction_qualifier="up"),
            Row(subject="A", predicate="p", object="B",
                object_aspect_qualifier="activity", qualified_predicate="qp",
                object_direction_qualifier="up"),
        ]
    )
    out = D.qualifier_free_edges(edges)
    assert out.count() == 1  # both collapse to the same qualifier-free edge
    r = out.collect()[0]
    assert r.object_aspect_qualifier is None


def test_bundle_diff_statuses(spark):
    """Known diff: one removed, one added, one kept."""
    from orion_spark.operators.analyze import bundle_diff

    old = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c")], "subject string, predicate string, object string"
    )
    new = spark.createDataFrame(
        [("a", "p", "c"), ("a", "p", "d")], "subject string, predicate string, object string"
    )
    out = {(r.subject, r.object): r.status for r in bundle_diff(old, new).collect()}
    assert out == {("a", "b"): "removed", ("a", "c"): "kept", ("a", "d"): "added"}
