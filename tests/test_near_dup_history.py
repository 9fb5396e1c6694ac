"""Persisted near-dup band store (llm/near_dup_history): lifecycle,
probe semantics, DuckDB mirror parity, and the streaming standing gate."""

import json

import duckdb
from pyspark.sql import functions as F

from orion_spark.llm import near_dup_history as NH

HIST = (
    "the quick brown fox jumps over the lazy dog near the river bank today "
    "while the afternoon sun warms the quiet meadow beyond the old fence"
)
# one word changed ("warms" -> "heats"): exact-key gates miss it, the
# band store must not
NEAR = HIST.replace("warms", "heats")
FRESH = (
    "completely different content about distributed query engines and the "
    "cost model of shuffle exchanges on very large analytical clusters"
)


def test_probe_hits_near_and_misses_fresh(spark, tmp_path):
    path = str(tmp_path / "store")
    hist = spark.createDataFrame([(1, HIST)], "doc_id long, text string")
    NH.save_band_store(
        NH.band_store_build(hist, k=5, num_hashes=16), path, k=5, num_hashes=16
    )
    store, k, nh, rpb = NH.load_band_store(spark, path)
    assert (k, nh, rpb) == (5, 16, 1)
    probe = spark.createDataFrame(
        [(10, NEAR), (11, FRESH), (12, HIST)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.near_dup_hit
        for r in NH.band_store_probe(probe, store, k=k, num_hashes=nh).collect()
    }
    assert got == {10: True, 11: False, 12: True}


def test_short_docs_emit_no_keys_and_never_hit(spark, tmp_path):
    """< k words => no shingles => no band keys; such docs can never
    near-dup on this scheme (matches minhash_lsh_pairs)."""
    hist = spark.createDataFrame([(1, HIST)], "doc_id long, text string")
    store = NH.band_store_build(hist)
    probe = spark.createDataFrame(
        [(20, "too few words")], "doc_id long, text string"
    )
    out = NH.band_store_probe(probe, store).collect()
    assert len(out) == 1 and out[0].near_dup_hit is False
    assert NH.minhash_band_keys(probe).count() == 0


def test_append_then_compact_roundtrip(spark, tmp_path):
    path = str(tmp_path / "store")
    d1 = spark.createDataFrame([(1, HIST)], "doc_id long, text string")
    d2 = spark.createDataFrame([(2, FRESH)], "doc_id long, text string")
    NH.save_band_store(NH.band_store_build(d1), path)
    NH.append_band_store(NH.band_store_build(d2), path)
    # duplicate append is harmless for probe semantics
    NH.append_band_store(NH.band_store_build(d2), path)
    store, k, nh, _rpb = NH.load_band_store(spark, path)
    raw_rows = store.count()
    probe = spark.createDataFrame(
        [(30, NEAR), (31, FRESH.replace("cost", "price"))],
        "doc_id long, text string",
    )
    hits = {
        r.doc_id: r.near_dup_hit
        for r in NH.band_store_probe(probe, store, k=k, num_hashes=nh).collect()
    }
    assert hits == {30: True, 31: True}
    NH.compact_band_store(spark, path)
    store2, _, _, _ = NH.load_band_store(spark, path)
    assert store2.count() < raw_rows  # dup append compacted away
    hits2 = {
        r.doc_id: r.near_dup_hit
        for r in NH.band_store_probe(probe, store2, k=k, num_hashes=nh).collect()
    }
    assert hits2 == hits  # semantics unchanged by compaction


def test_probe_duckdb_oracle_parity(spark, tmp_path):
    """band_store_probe_sql reproduces the probe verdicts bit-for-bit on
    a messy store/probe split."""
    rows = [
        (1, HIST),
        (2, FRESH),
        (3, "yet another history document with plenty of long words inside"),
    ]
    probes = [
        (10, NEAR),
        (11, FRESH.replace("engines", "systems")),
        (12, "totally unrelated short novel text that shares no shingles "
             "with anything stored before this moment in the fixture"),
    ]
    hist = spark.createDataFrame(rows, "doc_id long, text string")
    probe = spark.createDataFrame(probes, "doc_id long, text string")
    store = NH.band_store_build(hist)
    got = {
        r.doc_id: r.near_dup_hit
        for r in NH.band_store_probe(probe, store).collect()
    }
    hist_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows
    )
    probe_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in probes
    )
    oracle = duckdb.sql(NH.band_store_probe_sql(probe_sql, hist_sql)).fetchall()
    assert {int(d): bool(h) for d, h in oracle} == got


def test_streaming_near_dup_standing_gate(spark, tmp_path):
    """The round-10 funnel closure: a re-ingested NEAR-duplicate (one
    word changed — both exact-key blooms would miss it) of the existing
    corpus is dropped per micro-batch; update_near_dup_store=True appends
    survivors' band keys so a SECOND run (fresh sink, fresh checkpoint —
    the checkpoint-replay equivalent) drops near-dups of THEM via the
    store alone; and per-gate metrics record the drop."""
    from orion_spark.streaming import curation as C

    hist_line1 = (
        "the historical document line is long clean english text right here"
    )
    hist_line2 = (
        "a second long clean line keeps the quality gate comfortably happy"
    )
    hist_text = hist_line1 + "\n" + hist_line2
    near_text = hist_text.replace("comfortably", "entirely")
    fresh_text = (
        "the genuinely new document arrives with one long english sentence\n"
        "and brings along another long and reasonably clean second line"
    )
    near_fresh = fresh_text.replace("reasonably", "surprisingly")

    store_path = str(tmp_path / "bands")
    # history store is built over the curated corpus's clean_text
    hist = spark.createDataFrame([(1, hist_text)], "doc_id long, text string")
    NH.save_band_store(NH.band_store_build(hist), store_path)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    metrics = str(tmp_path / "funnel_metrics.jsonl")
    spark.createDataFrame(
        [(2, near_text, "en", "s1", len(near_text)),
         (3, fresh_text, "en", "s1", len(fresh_text))],
        C.DOCS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    C.run_curation_stream(
        spark, src, out, ck,
        near_dup_store_path=store_path, update_near_dup_store=True,
        metrics_path=metrics,
    )
    landed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert landed == {3}  # near-dup of history dropped, fresh doc landed

    # per-gate metrics: the drop is attributed to the near-dup gate
    recs = [json.loads(l) for l in open(metrics)]
    assert len(recs) == 1
    assert recs[0]["input"] == 2
    assert recs[0]["near_dup_gate"] == 1
    assert recs[0]["exact_dedup"] == 1

    # second run: fresh sink + checkpoint; near-dup of run-1's SURVIVOR
    # must now be dropped by the appended store alone, and an exact
    # replay of the survivor itself also drops (idempotent re-ingest)
    src2, out2, ck2 = (str(tmp_path / p) for p in ("src2", "out2", "ck2"))
    spark.createDataFrame(
        [(7, near_fresh, "en", "s9", len(near_fresh)),
         (8, fresh_text, "en", "s9", len(fresh_text))],
        C.DOCS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src2)
    C.run_curation_stream(
        spark, src2, out2, ck2,
        near_dup_store_path=store_path, update_near_dup_store=True,
    )
    import os

    assert (not os.path.exists(out2)) or (
        spark.read.parquet(out2).count() == 0
    )


def test_funnel_observe_metrics_in_progress_payload(spark, tmp_path):
    """run_curation_stream's observe nodes (funnel_input/funnel_curated)
    must surface in the StreamingQueryProgress observedMetrics payload —
    the stream-side half of funnel observability (the sink-side half is
    metrics_path, asserted above)."""
    from orion_spark.streaming import curation as C
    from pyspark.sql import functions as F

    good = (
        "the observable document has one long clean english line right here\n"
        "and a second long line that keeps the quality gate clearly happy"
    )
    bad = "short junk"
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, good, "en", "s1", len(good)), (2, bad, "en", "s1", len(bad))],
        C.DOCS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src)

    docs = C.read_document_stream(spark, src).observe(
        "funnel_input", F.count(F.lit(1)).alias("rows")
    )
    stream = C.curate(docs).observe(
        "funnel_curated", F.count(F.lit(1)).alias("rows")
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    observed = {}
    for p in q.recentProgress:
        observed.update(p["observedMetrics"])
    assert observed["funnel_input"]["rows"] == 2
    assert observed["funnel_curated"]["rows"] == 1  # junk doc gated out


LONG = (
    "in the long history document every sentence keeps flowing with many "
    "ordinary english words that describe a quiet valley where a small river "
    "bends around old willow trees and the morning light settles gently over "
    "meadows while farmers walk their fields checking fences gates and troughs "
    "before the afternoon heat arrives and the whole village gathers near the "
    "market square to trade bread cheese apples and stories from the road"
)
NEAR_LONG = LONG.replace("willow", "poplar")   # j ~ 0.88 on 5-shingles


def test_rows_per_band_precision_knob(spark, tmp_path):
    """r-row banding is the precision knob the gate needs (no verify
    stage — the history text is not stored): with r=4 a true near-dup
    (one word changed in a long doc, Jaccard ~0.88) still collides,
    while a moderately-similar short doc passes — at r=1 its ~0.2
    Jaccard would fire with probability ~97%; DuckDB mirror agrees
    bit-for-bit. (The operating-point math is in the minhash_band_keys
    docstring; the SHORT one-word-change fixture has j ~ 0.6, which is
    exactly why the default r=1 exists for maximal recall.)"""
    moderately = (
        "the quick brown fox jumps over a sleepy cat near another stream "
        "in a different season as the evening moon cools a distant field"
    )
    path = str(tmp_path / "store4")
    hist = spark.createDataFrame([(1, LONG)], "doc_id long, text string")
    NH.save_band_store(
        NH.band_store_build(hist, rows_per_band=4), path, rows_per_band=4
    )
    store, k, nh, rpb = NH.load_band_store(spark, path)
    assert rpb == 4
    probe = spark.createDataFrame(
        [(10, NEAR_LONG), (11, moderately), (12, LONG)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.near_dup_hit
        for r in NH.band_store_probe(
            probe, store, k=k, num_hashes=nh, rows_per_band=rpb
        ).collect()
    }
    assert got[12] is True          # exact copy always collides
    assert got[10] is True          # one-word change still caught at r=4
    assert got[11] is False         # moderately-similar doc passes at r=4

    import duckdb as _dd

    hist_sql = f"SELECT 1 AS doc_id, '{LONG}' AS text"
    probe_sql = (
        f"SELECT 10 AS doc_id, '{NEAR_LONG}' AS text UNION ALL "
        f"SELECT 11, '{moderately}' UNION ALL SELECT 12, '{LONG}'"
    )
    oracle = _dd.sql(
        NH.band_store_probe_sql(probe_sql, hist_sql, rows_per_band=4)
    ).fetchall()
    assert {int(d): bool(h) for d, h in oracle} == got


def test_plan_shingle_md5_evaluated_once(spark):
    """Permanent guard for the CollapseProject trap (third recurrence:
    minhash_lsh_pairs round 7, this module's first fix, the 4952bac
    regression): the md5-per-shingle transform must appear exactly once
    in the OPTIMIZED plan — a collapsed plan shows it once per signature
    lane (16×) and runs ~8× slower at sf0.1. At r>1 each band adds one
    cheap md5 over the joined lane string, so the budget is 1 + n_bands."""
    df = spark.createDataFrame([(1, HIST)], "doc_id long, text string")
    for r, budget in ((1, 1), (4, 1 + 4), (8, 1 + 2)):
        plan = (
            NH.minhash_band_keys(df, rows_per_band=r)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("md5(") == budget, (
            f"rows_per_band={r}: expected {budget} md5 sites in the "
            f"optimized plan, found {plan.count('md5(')} — the shingle "
            f"hash projection has been inlined per signature lane"
        )


def test_rows_per_band_must_divide(spark):
    import pytest as _pt

    df = spark.createDataFrame([(1, HIST)], "doc_id long, text string")
    with _pt.raises(ValueError):
        NH.minhash_band_keys(df, num_hashes=16, rows_per_band=3).count()
