"""CLI smoke tests (reference parity: tests/test_cli_smoke.py) — run each
subcommand in-process against a tiny bundle."""

import json
import os

from pyspark.sql import Row

from orion_spark import cli
from orion_spark.sources.kgx import write_bundle, write_kgx


def _bundle(spark, path):
    nodes = spark.createDataFrame(
        [Row(id="A:1", name="a", category=["biolink:Gene"]),
         Row(id="B:2", name="b", category=["biolink:Disease"])]
    )
    edges = spark.createDataFrame(
        [Row(subject="A:1", predicate="biolink:related_to", object="B:2",
             primary_knowledge_source="infores:x")]
    )
    write_bundle(nodes, edges, path)
    return nodes, edges


def test_cli_qc_and_meta_kg(spark, tmp_path):
    bundle = str(tmp_path / "bundle")
    _bundle(spark, bundle)
    qc_out = str(tmp_path / "qc.json")
    assert cli.main(["qc", "--bundle", bundle, "--out", qc_out]) == 0
    qc = json.load(open(qc_out))
    assert qc["predicate_totals"] == {"biolink:related_to": 1}

    mk_out = str(tmp_path / "meta.json")
    assert cli.main(["meta-kg", "--bundle", bundle, "--out", mk_out]) == 0
    mk = json.load(open(mk_out))
    assert mk["edges"][0]["subject_type"] == "biolink:Gene"


def test_cli_merge_jsonl_inputs(spark, tmp_path):
    nodes_a = spark.createDataFrame(
        [Row(id="A:1", name="a", category=["biolink:Gene"], publications=["PMID:1"])]
    )
    nodes_b = spark.createDataFrame(
        [Row(id="A:1", name=None, category=["biolink:Gene"], publications=["PMID:2"])],
        schema=nodes_a.schema,
    )
    edges = spark.createDataFrame(
        [Row(subject="A:1", predicate="p", object="A:1",
             primary_knowledge_source="infores:x")]
    )
    pa, pb, pe = (str(tmp_path / x) for x in ("na", "nb", "e"))
    write_kgx(nodes_a, pa)
    write_kgx(nodes_b, pb)
    write_kgx(edges, pe)
    out = str(tmp_path / "merged")
    assert cli.main(["merge", "--nodes", pa, pb, "--edges", pe, "--out", out]) == 0
    merged = spark.read.parquet(os.path.join(out, "nodes"))
    row = merged.collect()[0]
    assert row.publications == ["PMID:1", "PMID:2"]
    assert row.name == "a"


def test_cli_neo4j_csv(spark, tmp_path):
    bundle = str(tmp_path / "bundle2")
    _bundle(spark, bundle)
    out = str(tmp_path / "csvs")
    assert cli.main(["neo4j-csv", "--bundle", bundle, "--out", out]) == 0
    assert os.path.exists(os.path.join(out, "nodes-header.csv"))
    assert os.path.exists(os.path.join(out, "manifest.json"))


def test_cli_publish(spark, tmp_path, capsys):
    # lay a completed build where publish expects it
    storage = str(tmp_path / "storage")
    build_dir = os.path.join(storage, "graphs", "g1", "cafebabe")
    _bundle(spark, build_dir)
    with open(os.path.join(build_dir, "_BUILD_COMPLETE"), "w") as fh:
        fh.write("cafebabe")
    assert cli.main(["publish", "--storage", storage, "--graph-id", "g1",
                     "--build-version", "cafebabe"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["release"] == "1.0.0"
    assert os.path.exists(os.path.join(out["dir"], "_BUILD_COMPLETE"))


def test_cli_compact(spark, tmp_path):
    from orion_spark.cli import main

    path = str(tmp_path / "to_compact")
    spark.range(1000).repartition(16).write.parquet(path)
    rc = main(["compact", "--path", path, "--target-mb", "1024"])
    assert rc == 0
    import os as _os

    assert sum(f.endswith(".parquet") for f in _os.listdir(path)) == 1
