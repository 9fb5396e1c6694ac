"""Gopher quality-rule panel: per-rule hand-checked cases + DuckDB oracle
differential on adversarial text shapes (empty docs, bullets, ellipses,
symbol spam, unicode bullets)."""

import pytest
from pyspark.sql import functions as F

from orion_spark.llm import textstats as TS


def _panel(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return {r.doc_id: r.asDict() for r in TS.gopher_panel(df, **kw).collect()}


GOOD = (
    "the quick brown fox jumps over the lazy dog and that sentence must have "
    "enough words to be considered with some more plain filler words added "
    "here so the total word count passes fifty of the required minimum limit "
    "for this good document to be kept by the gopher rules with room to spare "
    "and still read like plain english text written by a person"
)


def test_good_document_passes_all_rules(spark):
    p = _panel(spark, [GOOD])[0]
    assert p["gopher_pass"]
    assert all(v for k, v in p.items() if k.startswith("rule_"))


def test_short_document_fails_word_count_only_when_short(spark):
    p = _panel(spark, ["the small text with few words"])[0]
    assert not p["rule_word_count"]
    assert not p["gopher_pass"]


def test_symbol_spam_fails_symbol_ratio(spark):
    spam = GOOD + " " + "#" * 40
    p = _panel(spark, [spam])[0]
    assert not p["rule_symbol_ratio"]


def test_bullet_lines_fail(spark):
    doc = "\n".join(f"- bullet item {i} in the listing" for i in range(20))
    p = _panel(spark, [doc], min_words=5)[0]
    assert not p["rule_bullet_lines"]


def test_ellipsis_lines_fail(spark):
    doc = "\n".join(f"the line {i} trails off into nothing..." for i in range(10))
    p = _panel(spark, [doc], min_words=5)[0]
    assert not p["rule_ellipsis_lines"]


def test_numeric_noise_fails_alpha_words(spark):
    doc = " ".join(str(i) for i in range(100)) + " the and of that be to have with"
    p = _panel(spark, [doc])[0]
    assert not p["rule_alpha_words"]


def test_no_stopwords_fails(spark):
    doc = " ".join(f"zz{i}" for i in range(80))
    p = _panel(spark, [doc])[0]
    assert not p["rule_stopwords"]


def test_empty_document_fails_everything_gracefully(spark):
    p = _panel(spark, ["", "   \n  \n"])
    for d in p.values():
        assert d["n_words"] == 0
        assert not d["gopher_pass"]


def test_unicode_bullet_counts(spark):
    doc = "\n".join(f"• point {i} of the agenda" for i in range(12))
    p = _panel(spark, [doc], min_words=5)[0]
    assert not p["rule_bullet_lines"]


def test_gopher_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    texts = [
        GOOD,
        "short one",
        "",
        "   \n\t ",
        GOOD + " " + "#" * 60,
        "\n".join(f"- item {i} listed here" for i in range(15)),
        "\n".join(f"line {i} fades away..." for i in range(8)),
        " ".join(str(i) for i in range(120)),
        "• uno\n• dos\n• tres",
        "The UPPER Case TEXT with The and Of that BE to HAVE with "
        + " ".join(f"word{i}" for i in range(60)),
        "dots....everywhere......yes...",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in TS.gopher_panel(df).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = {
        int(row[0]): tuple(
            int(v) if isinstance(v, int) else bool(v) for v in row[1:]
        )
        for row in con.sql(TS.gopher_rules_oracle_sql(table="documents")).fetchall()
    }
    got_norm = {
        k: tuple(int(v) if isinstance(v, int) else bool(v) for v in vals)
        for k, vals in got.items()
    }
    assert got_norm == want
