"""Extract-layer tests (SURVEY §2.2), mirroring the reference's parser
golden tests (tests/test_loaders.py) with a CTD-shaped inline fixture."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from orion_spark.operators import extract as E


def _source(spark):
    # source_tabular shape (FIXTURES.md §6)
    rows = [
        Row(subject_local_id="1", object_local_id="D1", source_predicate="marker",
            direction="up", taxon_id="9606", pmid="123", score=0.9),
        Row(subject_local_id="2", object_local_id="D2", source_predicate="therapeutic",
            direction=None, taxon_id="9606", pmid=None, score=0.2),
        Row(subject_local_id="3", object_local_id="D3", source_predicate="unknown_rel",
            direction=None, taxon_id="9606", pmid="99", score=0.8),
        Row(subject_local_id="4", object_local_id="D4", source_predicate="marker",
            direction=None, taxon_id="10090", pmid=None, score=0.9),  # filtered taxon
    ]
    return spark.createDataFrame(rows)


PRED_MAP = {
    "marker": "biolink:biomarker_for",
    "therapeutic": "biolink:treats",
}


def _spec():
    return E.ExtractSpec(
        subject_id=F.concat(F.lit("HGNC:"), F.col("subject_local_id")),
        object_id=F.concat(F.lit("MESH:"), F.col("object_local_id")),
        predicates=[E.predicate_remap(F.col("source_predicate"), PRED_MAP)],
        subject_categories=["biolink:Gene"],
        object_categories=["biolink:Disease"],
        edge_properties={
            "publications": F.when(
                F.col("pmid").isNotNull(), F.array(F.concat(F.lit("PMID:"), F.col("pmid")))
            ),
            "score": F.col("score"),
        },
        primary_knowledge_source="infores:ctd-like",
        row_filter=F.col("taxon_id").isin("9606"),
    )


def test_extract_basic(spark):
    subj, obj, edges = E.extract(_source(spark), _spec())
    e = {r.subject: r for r in edges.collect()}
    # row 3 has unmapped predicate -> dropped (P5); row 4 filtered (P3)
    assert sorted(e) == ["HGNC:1", "HGNC:2"]
    assert e["HGNC:1"].predicate == "biolink:biomarker_for"
    assert e["HGNC:1"].publications == ["PMID:123"]
    assert e["HGNC:2"].predicate == "biolink:treats"
    assert e["HGNC:2"].publications is None
    assert all(r.primary_knowledge_source == "infores:ctd-like" for r in e.values())
    assert sorted(r.id for r in subj.collect()) == ["HGNC:1", "HGNC:2"]
    assert sorted(r.id for r in obj.collect()) == ["MESH:D1", "MESH:D2"]


def test_extract_keeps_unconnected_when_asked(spark):
    subj, _, _ = E.extract(_source(spark), _spec(), exclude_unconnected=False)
    # row 3's subject survives even though its predicate didn't map
    assert "HGNC:3" in {r.id for r in subj.collect()}


def test_multi_predicate_fanout(spark):
    spec = _spec()
    spec.predicates = [
        E.predicate_remap(F.col("source_predicate"), PRED_MAP),
        F.when(F.col("direction") == "up", F.lit("biolink:upregulates")),
    ]
    _, _, edges = E.extract(_source(spark), spec)
    preds = sorted(r.predicate for r in edges.where("subject = 'HGNC:1'").collect())
    assert preds == ["biolink:biomarker_for", "biolink:upregulates"]


def test_hgvs_construction(spark):
    rows = [
        Row(chrom=1, pos=100, ref="A", alt="G"),      # SNV
        Row(chrom=2, pos=200, ref="AGG", alt="A"),    # deletion
        Row(chrom=3, pos=300, ref="C", alt="CTT"),    # insertion
        Row(chrom=4, pos=400, ref="CT", alt="GA"),    # delins
    ]
    df = spark.createDataFrame(rows)
    out = df.select(
        "chrom",
        E.hgvs_from_coords(F.col("chrom"), F.col("pos"), F.col("ref"), F.col("alt")).alias("hgvs"),
    )
    got = {r.chrom: r.hgvs for r in out.collect()}
    assert got[1] == "NC_000001:g.100A>G"
    assert got[2] == "NC_000002:g.201_202del"
    assert got[3] == "NC_000003:g.300_301insTT"
    assert got[4] == "NC_000004:g.400_401delinsGA"


def test_extract_skip_counts_via_observe(spark):
    """P9: row-validation skip counts through the Observation API — the
    declarative analogue of the reference's load_metadata counters
    (orion/extractor.py:21,56,66)."""
    from pyspark.sql import Observation

    src = _source(spark)
    obs_in = Observation("rows_in")
    obs_kept = Observation("rows_kept")
    observed = src.observe(obs_in, F.count(F.lit(1)).alias("n"))
    kept = observed.where(F.col("taxon_id") == "9606").observe(
        obs_kept, F.count(F.lit(1)).alias("n")
    )
    assert kept.count() == 3
    assert obs_in.get["n"] == 4
    assert obs_kept.get["n"] == 3
