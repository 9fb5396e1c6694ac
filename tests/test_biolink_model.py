"""Biolink dim-table builder (orion/biolink_utils.py:44-80,
redundant_kg.py:28-31 parity): the packaged subset YAML must regenerate
the exact dimension rows the oracle SQL pins, and the hierarchy walks
must match bmt semantics on a known real-model ancestor chain."""

from orion_spark.plans.tpch_graph import CATEGORY_CLOSURE_ROWS, CLOSURE_ROWS
from orion_spark.sources import biolink_model as B

REAL_CHAIN_YAML = """
version: 4.2.1
slots:
  related to:
    symmetric: true
  interacts with:
    is_a: related to
    symmetric: true
  physically interacts with:
    is_a: interacts with
  directly physically interacts with:
    is_a: physically interacts with
  affects:
    is_a: related to
  affected by:
    is_a: related to
    inverse: affects
classes:
  named thing: {}
  biological entity:
    is_a: named thing
  gene or gene product: {}
  gene:
    is_a: biological entity
    mixins: [gene or gene product]
  RNA product:
    is_a: biological entity
"""


def test_subset_regenerates_pinned_dims():
    m = B.load_biolink_model()
    assert sorted(m.predicate_closure_rows()) == sorted(
        tuple(r) for r in CLOSURE_ROWS
    )
    assert sorted(m.category_closure_rows()) == sorted(CATEGORY_CLOSURE_ROWS)


def test_known_real_model_ancestor_chain():
    # the public biolink chain: directly_physically_interacts_with <
    # physically_interacts_with < interacts_with < related_to
    m = B.parse_biolink_model(REAL_CHAIN_YAML)
    assert m.predicate_ancestors("directly physically interacts with") == [
        "physically interacts with", "interacts with", "related to"]
    ancs = sorted(
        r[1] for r in m.predicate_closure_rows()
        if r[0] == "biolink:directly_physically_interacts_with")
    assert ancs == ["biolink:interacts_with",
                    "biolink:physically_interacts_with", "biolink:related_to"]
    # mixins participate in ancestry (bmt get_ancestors(mixin=True))
    assert m.class_ancestors("gene") == [
        "biological entity", "gene or gene product", "named thing"]


def test_invert_predicate_semantics():
    m = B.parse_biolink_model(REAL_CHAIN_YAML)
    # symmetric -> itself (orion/biolink_utils.py:74-76)
    assert m.invert_predicate("biolink:interacts_with") == "biolink:interacts_with"
    # declared inverse -> its curie
    assert m.invert_predicate("biolink:affected_by") == "biolink:affects"
    # no inverse, not symmetric -> None
    assert m.invert_predicate("biolink:physically_interacts_with") is None
    assert m.invert_predicate("biolink:not_a_predicate") is None


def test_find_leaves_and_valid_node_types():
    m = B.parse_biolink_model(REAL_CHAIN_YAML)
    # parent concepts drop, unknowns drop (orion/biolink_utils.py:44-61)
    assert m.find_leaves(
        {"biolink:Gene", "biolink:BiologicalEntity", "biolink:Nope"}
    ) == {"biolink:Gene"}
    assert m.find_leaves({"biolink:Gene", "biolink:RNAProduct"}) == {
        "biolink:Gene", "biolink:RNAProduct"}
    assert m.valid_node_types() == frozenset(
        {"biolink:NamedThing", "biolink:BiologicalEntity", "biolink:Gene",
         "biolink:RNAProduct"})


def test_qualifier_detection():
    m = B.load_biolink_model()
    assert m.is_qualifier("object aspect qualifier")
    assert m.is_qualifier("qualified predicate")
    assert not m.is_qualifier("has part")
    assert "object_direction_qualifier" in m.qualifier_slots()
    # qualifier slots never leak into the predicate closure
    terms = {r[0] for r in m.predicate_closure_rows()}
    assert not any("qualifier" in t for t in terms)


def test_curie_formatting_and_version():
    assert B.pred_curie("has part") == "biolink:has_part"
    assert B.class_curie("RNA product") == "biolink:RNAProduct"
    assert B.class_curie("named thing") == "biolink:NamedThing"
    m = B.parse_biolink_model(REAL_CHAIN_YAML)
    assert m.model_version.startswith("4.2.1-") and len(m.model_version) > 8
