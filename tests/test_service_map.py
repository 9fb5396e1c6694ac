"""Service-map provider tests (SURVEY §2.6) — static transport standing in
for NodeNorm/EdgeNorm, mirroring the reference's mocked-response strategy
(tests/test_kgx_file_normalizer.py)."""

import pytest
from pyspark.sql import Row

from orion_spark.sources import service_map as SM

NODE_RESPONSES = {
    "HGNC:1": {
        "normalized_ids": ["NCBIGene:10"],
        "normalized_name": "G10",
        "normalized_categories": ["biolink:Gene"],
        "equivalent_identifiers": ["HGNC:1", "NCBIGene:10"],
        "information_content": 75.0,
        "taxa": ["NCBITaxon:9606"],
    },
    "DBSNP:rs1": {"normalized_ids": ["CAID:CA1", "CAID:CA2"]},
}


def test_build_node_norm_map(spark):
    nodes = spark.createDataFrame(
        [Row(id="HGNC:1"), Row(id="HGNC:1"), Row(id="DBSNP:rs1"), Row(id="MISS:1")]
    )
    out = SM.build_node_norm_map(
        nodes, SM.dict_transport(NODE_RESPONSES), batch_size=2, max_parallelism=2
    )
    rows = {r.original_id: r for r in out.collect()}
    assert len(rows) == 3  # distinct() dedups before the "service" sees keys
    assert rows["HGNC:1"].normalized_ids == ["NCBIGene:10"]
    assert rows["HGNC:1"].information_content == 75.0
    assert rows["DBSNP:rs1"].normalized_ids == ["CAID:CA1", "CAID:CA2"]
    assert rows["MISS:1"].normalized_ids == []  # miss -> empty, kept as a row


def test_node_norm_map_feeds_normalize_join(spark):
    from orion_spark.operators.normalize import normalize_nodes

    nodes = spark.createDataFrame(
        [Row(id="HGNC:1", name="old", category=["biolink:NamedThing"])]
    )
    nm = SM.build_node_norm_map(nodes, SM.dict_transport(NODE_RESPONSES))
    out = normalize_nodes(nodes, nm, strict=True).collect()
    assert len(out) == 1 and out[0].id == "NCBIGene:10"


def test_build_predicate_norm_map(spark):
    edges = spark.createDataFrame(
        [Row(predicate="affects"), Row(predicate="caused_by"), Row(predicate="affects")]
    )
    transport = SM.dict_transport(
        {
            "affects": {"normalized_predicate": "biolink:affects"},
            "caused_by": {"normalized_predicate": "biolink:causes", "inverted": True},
        }
    )
    out = {r.original_predicate: r for r in
           SM.build_predicate_norm_map(edges, transport).collect()}
    assert out["affects"].normalized_predicate == "biolink:affects"
    assert out["affects"].inverted is False
    assert out["caused_by"].inverted is True


def test_retrying_transport():
    calls = []

    def flaky(keys):
        calls.append(keys)
        if len(calls) < 3:
            raise ConnectionError("503")
        return {k: {"normalized_predicate": "x"} for k in keys}

    wrapped = SM.retrying(flaky, retries=5, backoff=0.0)
    assert wrapped(["a"]) == {"a": {"normalized_predicate": "x"}}
    assert len(calls) == 3

    def always_fails(keys):
        raise ConnectionError("500")

    with pytest.raises(ConnectionError):
        SM.retrying(always_fails, retries=2, backoff=0.0)(["a"])


def test_scalar_functions(spark):
    from pyspark.sql import functions as F

    from orion_spark.functions import scalars as SC

    df = spark.createDataFrame([Row(curie="HGNC:77", label="Some Label-X", n=14)])
    out = df.select(
        SC.curie_prefix(F.col("curie")).alias("p"),
        SC.curie_local_id(F.col("curie")).alias("l"),
        SC.snakify(F.col("label")).alias("s"),
        SC.int_to_roman(F.col("n")).alias("r"),
        SC.roman_to_int(F.lit("XIV")).alias("ri"),
    ).collect()[0]
    assert out.p == "HGNC" and out.l == "77"
    assert out.s == "some_label_x"
    assert out.r == "XIV" and out.ri == 14
