"""Bloom-filter incremental dedup: soundness (no false negatives ever),
bitmap compactness, incremental merge == full rebuild, and the probe plan
staying broadcast/map-only."""

import pytest
from pyspark.sql import functions as F

from orion_spark.llm import bloom as BL

M = 1 << 14
K = 4


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_bloom_no_false_negatives(spark):
    hist = _docs(spark, [f"history document number {i}" for i in range(200)])
    bloom = BL.bloom_build(hist, "text", M, K)
    probed = BL.bloom_probe(hist, bloom, "text", M, K)
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_bloom_rejects_most_unseen(spark):
    hist = _docs(spark, [f"history document number {i}" for i in range(200)])
    fresh = _docs(spark, [f"fresh unseen text {i}" for i in range(200)])
    bloom = BL.bloom_build(hist, "text", M, K)
    hits = BL.bloom_probe(fresh, bloom, "text", M, K).where("bloom_hit").count()
    # 200 keys * 4 bits in 16384 bits -> FP rate ~ (1-e^{-800/16384})^4 ~ 5e-6
    assert hits <= 2


def test_bloom_bitmap_is_bounded(spark):
    hist = _docs(spark, [f"history document number {i}" for i in range(500)])
    bloom = BL.bloom_build(hist, "text", M, K)
    assert bloom.count() <= M // 32


def test_bloom_merge_equals_full_rebuild(spark):
    a = _docs(spark, [f"batch a {i}" for i in range(100)])
    b = _docs(spark, [f"batch b {i}" for i in range(100)])
    merged = BL.bloom_merge(
        BL.bloom_build(a, "text", M, K), BL.bloom_build(b, "text", M, K)
    )
    full = BL.bloom_build(a.unionByName(b), "text", M, K)
    assert (
        merged.orderBy("word_idx").collect() == full.orderBy("word_idx").collect()
    )


def test_bloom_decontaminate_drops_all_seen(spark):
    hist = _docs(spark, [f"doc {i}" for i in range(50)])
    batch = _docs(spark, [f"doc {i}" for i in range(30, 80)])
    kept = BL.bloom_decontaminate(batch, hist, "text", M, K)
    kept_texts = {r.text for r in kept.collect()}
    # everything in the overlap [30, 50) must be gone — soundness
    assert not any(f"doc {i}" in kept_texts for i in range(30, 50))
    # and (at this load factor) the genuinely-new tail survives
    assert len(kept_texts) >= 28


def test_bloom_probe_empty_history(spark):
    batch = _docs(spark, ["a", "b"])
    hist = _docs(spark, ["never"]).where("doc_id < 0")
    bloom = BL.bloom_build(hist, "text", M, K)
    probed = BL.bloom_probe(batch, bloom, "text", M, K)
    assert probed.where("bloom_hit").count() == 0
    assert probed.count() == 2


def test_bloom_probe_plan_is_broadcast_map_only(spark):
    """The probe must not shuffle the batch: its physical plan carries a
    BroadcastNestedLoopJoin/BroadcastExchange of the packed one-row bitmap
    and NO shuffle exchange on the probe side."""
    hist = _docs(spark, [f"h {i}" for i in range(50)])
    batch = _docs(spark, [f"b {i}" for i in range(50)])
    probed = BL.bloom_probe(batch, BL.bloom_build(hist, "text", M, K), "text", M, K)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan


def test_bloom_matches_duckdb_oracle(spark, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    docs = _docs(
        spark,
        [f"history document number {i}" for i in range(40)]
        + [f"history document number {i}" for i in range(10)]  # dups
        + [f"fresh {i}" for i in range(40)],
    )
    pdf = docs.toPandas()
    hist_pred = "doc_id % 3 = 0"
    bloom = BL.bloom_build(docs.where(F.expr(hist_pred)), "text", M, K)
    got = {
        r.doc_id: r.bloom_hit
        for r in BL.bloom_probe(docs, bloom, "text", M, K).collect()
    }
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = BL.bloom_probe_oracle_sql(
        batch_sql="SELECT doc_id, text FROM docs",
        history_sql=f"SELECT text FROM docs WHERE {hist_pred}",
        key_expr="text",
        id_col="doc_id",
        m_bits=M,
        k=K,
    )
    want = {int(i): bool(h) for i, h in con.sql(sql).fetchall()}
    assert got == want


def test_curation_sink_bloom_gate(spark, tmp_path):
    """The foreachBatch sink with a persisted bloom history gate drops
    previously-seen clean_text before any other gate (batch-mode call of
    the sink function — foreachBatch bodies are plain static-frame code)."""
    from orion_spark.streaming.curation import curated_dedup_sink

    hist = _docs(spark, [f"seen line {i}" for i in range(40)]).withColumnRenamed(
        "text", "clean_text"
    )
    bloom = BL.bloom_build(hist, "clean_text", M, K)
    bloom_path = str(tmp_path / "bloom")
    BL.save_bloom(bloom, bloom_path, M, K)

    batch = spark.createDataFrame(
        [
            (i, "src", "en", 0.9, t)
            for i, t in enumerate(
                [f"seen line {i}" for i in range(5)]
                + [f"brand new line {i}" for i in range(5)]
            )
        ],
        ["doc_id", "source", "lang_pred", "quality", "clean_text"],
    )
    out = str(tmp_path / "curated")
    sink = curated_dedup_sink(
        spark, out, str(tmp_path / "ckpt"), bloom_history_path=bloom_path
    )
    sink(batch, 0)
    kept = {r.clean_text for r in spark.read.parquet(out).collect()}
    assert kept == {f"brand new line {i}" for i in range(5)}


def test_save_load_bloom_roundtrip(spark, tmp_path):
    hist = _docs(spark, [f"doc {i}" for i in range(30)])
    bloom = BL.bloom_build(hist, "text", M, K)
    path = str(tmp_path / "bf")
    BL.save_bloom(bloom, path, M, K)
    loaded, m, k = BL.load_bloom(spark, path)
    assert (m, k) == (M, K)
    assert (
        loaded.orderBy("word_idx").collect() == bloom.orderBy("word_idx").collect()
    )
