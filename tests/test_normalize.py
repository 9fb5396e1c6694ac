"""Normalization-stage tests, mirroring the reference's mocked-map strategy
(reference: tests/test_kgx_file_normalizer.py — static NODE_NORM_RESPONSE,
strict vs lenient, splits, edge endpoint drops, self-loop removal)."""

from pyspark.sql import Row

from orion_spark.operators import normalize as N


def _norm_map(spark):
    rows = [
        Row(original_id="HGNC:1", normalized_ids=["NCBIGene:10"],
            normalized_name="G10", normalized_categories=["biolink:Gene"],
            equivalent_identifiers=["HGNC:1", "NCBIGene:10"],
            information_content=75.0, taxa=["NCBITaxon:9606"]),
        # 1 -> 2 split (variant-style)
        Row(original_id="DBSNP:rs1", normalized_ids=["CAID:CA1", "CAID:CA2"],
            normalized_name=None, normalized_categories=["biolink:SequenceVariant"],
            equivalent_identifiers=["DBSNP:rs1"], information_content=None, taxa=None),
        # failure: empty mapping
        Row(original_id="BAD:1", normalized_ids=[],
            normalized_name=None, normalized_categories=None,
            equivalent_identifiers=None, information_content=None, taxa=None),
    ]
    return spark.createDataFrame(rows)


def _nodes(spark):
    return spark.createDataFrame(
        [
            Row(id="HGNC:1", name="old", category=["biolink:NamedThing"]),
            Row(id="DBSNP:rs1", name=None, category=["biolink:NamedThing"]),
            Row(id="BAD:1", name="bad", category=["biolink:NamedThing"]),
            Row(id="MISSING:1", name="m", category=["biolink:NamedThing"]),
        ]
    )


def test_normalize_nodes_strict_drops_failures_and_splits(spark):
    out = N.normalize_nodes(_nodes(spark), _norm_map(spark), strict=True)
    ids = sorted(r.id for r in out.collect())
    assert ids == ["CAID:CA1", "CAID:CA2", "NCBIGene:10"]
    g = out.where("id = 'NCBIGene:10'").collect()[0]
    assert g.name == "G10"
    assert g.category == ["biolink:Gene"]
    assert g.original_id == "HGNC:1"


def test_normalize_nodes_lenient_keeps_misses(spark):
    out = N.normalize_nodes(_nodes(spark), _norm_map(spark), strict=False)
    ids = sorted(r.id for r in out.collect())
    assert "MISSING:1" in ids and "BAD:1" in ids


def test_normalization_failures(spark):
    fails = N.normalization_failures(_nodes(spark), _norm_map(spark))
    assert sorted(r.id for r in fails.collect()) == ["BAD:1", "MISSING:1"]


def test_normalize_edges_split_fanout_and_drops(spark):
    edges = spark.createDataFrame(
        [
            Row(subject="HGNC:1", predicate="biolink:related_to",
                object="DBSNP:rs1", primary_knowledge_source="infores:x"),
            Row(subject="HGNC:1", predicate="biolink:related_to",
                object="MISSING:1", primary_knowledge_source="infores:x"),
        ]
    )
    out = N.normalize_edges(edges, _norm_map(spark))
    rows = out.collect()
    # edge 1 fans out to 2 (object split); edge 2 dropped (object miss)
    assert len(rows) == 2
    assert sorted(r.object for r in rows) == ["CAID:CA1", "CAID:CA2"]
    assert all(r.subject == "NCBIGene:10" for r in rows)
    assert all(r.original_subject == "HGNC:1" for r in rows)


def test_normalize_edges_drops_subclass_self_loop(spark):
    nm = spark.createDataFrame(
        [
            Row(original_id="X:1", normalized_ids=["N:1"]),
            Row(original_id="X:2", normalized_ids=["N:1"]),  # collapses to same
        ]
    )
    edges = spark.createDataFrame(
        [Row(subject="X:1", predicate="biolink:subclass_of", object="X:2",
             primary_knowledge_source="infores:x")]
    )
    assert N.normalize_edges(edges, nm).count() == 0
    assert N.normalize_edges(edges, nm, drop_self_subclass=False).count() == 1


def test_normalize_predicates_fallback_and_flag(spark):
    pmap = spark.createDataFrame(
        [
            Row(original_predicate="affects", normalized_predicate="biolink:affects",
                inverted=False),
            Row(original_predicate="caused_by", normalized_predicate="biolink:causes",
                inverted=True),
        ]
    )
    edges = spark.createDataFrame(
        [
            Row(subject="A", predicate="affects", object="B"),
            Row(subject="A", predicate="caused_by", object="B"),
            Row(subject="A", predicate="unknown_pred", object="B"),
        ]
    )
    out = {r.original_predicate: r for r in N.normalize_predicates(edges, pmap).collect()}
    assert out["affects"].predicate == "biolink:affects"
    assert out["caused_by"].inverted is True
    assert out["unknown_pred"].predicate == "biolink:related_to"


def test_default_node_names_and_whitespace(spark):
    nodes = spark.createDataFrame(
        [Row(id="HGNC:77", name=None), Row(id="X:1", name="a\tb\nc")]
    )
    out = {r.id: r for r in N.default_node_names(
        N.flatten_whitespace(nodes, ["name"])).collect()}
    assert out["HGNC:77"].name == "77"
    assert out["X:1"].name == "a b c"
