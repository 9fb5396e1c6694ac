"""Structured Streaming extension tests (file source, availableNow trigger,
memory sink — deterministic)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from orion_spark.streaming import events as SE


def _write_events(spark, path):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=1, ts=base, user_id=1, event_type="click", value=1.0, props="{}"),
        Row(event_id=2, ts=base + datetime.timedelta(minutes=10), user_id=1,
            event_type="click", value=2.0, props="{}"),
        Row(event_id=3, ts=base + datetime.timedelta(hours=1, minutes=5), user_id=2,
            event_type="view", value=3.0, props="{}"),
        # duplicate event_id within watermark
        Row(event_id=1, ts=base, user_id=1, event_type="click", value=1.0, props="{}"),
    ]
    spark.createDataFrame(rows, SE.EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_windowed_counts_stream(spark, tmp_path):
    src = str(tmp_path / "events_src")
    _write_events(spark, src)
    SE.run_windowed_counts_to_memory(spark, src, table_name="wc_test")
    out = spark.sql("select * from wc_test").collect()
    got = {(r.window_start.hour, r.event_type): r.n for r in out}
    assert got[(0, "click")] == 3  # dup not removed in pure window count
    assert got[(1, "view")] == 1


def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "events_src2")
    _write_events(spark, src)
    stream = SE.read_event_stream(spark, src)
    q = (
        SE.deduped_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from dedup_test").collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3]


def test_merge_upsert_sink(spark, tmp_path):
    src = str(tmp_path / "events_src3")
    bundle = str(tmp_path / "bundle_edges")
    ckpt = str(tmp_path / "ckpt")
    _write_events(spark, src)
    stream = SE.event_edges(SE.read_event_stream(spark, src))
    q = (
        stream.writeStream.foreachBatch(SE.merge_upsert_sink(bundle, ckpt))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    merged = spark.read.parquet(bundle)
    # 4 raw edge rows, the duplicated event_id=1 rows merge to one edge
    assert merged.count() == 3
    assert "id" in merged.columns  # assigned merge key


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: two bursts > gap apart close
    one session mid-stream."""
    import datetime

    from orion_spark.streaming.sessionize import sessionize_stream

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # burst 1: two events 5 min apart
        Row(event_id=1, ts=base, user_id=1, event_type="click", value=1.0, props="{}"),
        Row(event_id=2, ts=base + datetime.timedelta(minutes=5), user_id=1,
            event_type="click", value=2.0, props="{}"),
        # burst 2: 2 hours later -> closes session 1 within the same batch
        Row(event_id=3, ts=base + datetime.timedelta(hours=2), user_id=1,
            event_type="view", value=4.0, props="{}"),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, SE.EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = SE.read_event_stream(spark, src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from sess_test").collect()
    assert len(out) == 1  # first session closed; second still open in state
    s = out[0]
    assert s.user_id == 1 and s.n_events == 2 and s.total_value == 3.0
    assert s.session_start.minute == 0 and s.session_end.minute == 5


def test_stream_static_dimension_join(spark, tmp_path):
    """Events enriched with a static user dimension; unmatched users keep
    NULL attributes (left join) — no state store, broadcast static side."""
    src = str(tmp_path / "events_src4")
    _write_events(spark, src)
    dim = spark.createDataFrame(
        [Row(user_id=1, segment="BUILDING")], "user_id bigint, segment string"
    )
    stream = SE.read_event_stream(spark, src)
    q = (
        SE.enrich_with_dimension(stream, dim)
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from enrich_test").collect()
    segs = {r.event_id: r.segment for r in out}
    assert segs[1] == "BUILDING" and segs[2] == "BUILDING"
    assert segs[3] is None
    assert len(out) == 4  # left join keeps every event incl. the dup id


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: run with a checkpoint, add a new
    source file, run again — the second run appends only the new rows."""
    src = str(tmp_path / "events_src5")
    ckpt = str(tmp_path / "ckpt5")
    out = str(tmp_path / "out5")
    _write_events(spark, src)

    def run_once():
        q = (
            SE.read_event_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).count()
    assert first == 4

    import datetime
    late = [Row(event_id=99, ts=datetime.datetime(2024, 1, 2), user_id=9,
                event_type="late", value=9.0, props="{}")]
    spark.createDataFrame(late, SE.EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    after = spark.read.parquet(out)
    assert after.count() == 5  # 4 old NOT reprocessed, 1 new appended
    assert after.where("event_type = 'late'").count() == 1


def test_stream_stream_interval_join(spark, tmp_path):
    """Clicks joined to purchases within 30 minutes after them, per user:
    the in-window purchase matches, the out-of-window one does not."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    clicks = [
        Row(event_id=1, ts=base, user_id=1, event_type="click", value=1.0, props="{}"),
        Row(event_id=2, ts=base, user_id=2, event_type="click", value=1.0, props="{}"),
    ]
    purchases = [
        # 10 min after user 1's click -> inside the window
        Row(event_id=10, ts=base + datetime.timedelta(minutes=10), user_id=1,
            event_type="purchase", value=5.0, props="{}"),
        # 2 hours after user 2's click -> outside
        Row(event_id=20, ts=base + datetime.timedelta(hours=2), user_id=2,
            event_type="purchase", value=5.0, props="{}"),
    ]
    cpath, ppath = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    spark.createDataFrame(clicks, SE.EVENTS_SCHEMA).coalesce(1).write.parquet(cpath)
    spark.createDataFrame(purchases, SE.EVENTS_SCHEMA).coalesce(1).write.parquet(ppath)

    joined = SE.interval_join_streams(
        SE.read_event_stream(spark, cpath), SE.read_event_stream(spark, ppath)
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from ssj_test").collect()
    assert [(r.l_event_id, r.r_event_id) for r in out] == [(1, 10)]


def test_session_window_stream(spark, tmp_path):
    """Native session_window in streaming mode: user 1's two clicks 10 min
    apart merge into one session (gap 30 min) spanning first event to
    last event + gap; user 2's lone event forms its own session. The
    duplicate event_id row lands inside user 1's session (pure count —
    no dedup stage in this pipeline)."""
    src = str(tmp_path / "events_sw")
    _write_events(spark, src)
    stream = SE.read_event_stream(spark, src)
    q = (
        SE.session_window_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sw_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        (r.user_id, r.session_start.minute, r.n_events): r.session_end
        for r in spark.sql("select * from sw_test").collect()
    }
    assert len(out) == 2
    end_u1 = out[(1, 0, 3)]
    assert (end_u1.hour, end_u1.minute) == (0, 40)  # last event 00:10 + 30 min
    assert (2, 5, 1) in {k for k in out}


def test_streaming_curation_pipeline(spark, tmp_path):
    """Streaming LLM-corpus curation end-to-end: quality/lang/C4 gates +
    cross-batch exact dedup through the foreachBatch sink; a rerun with
    new files keeps the dedup (first-seen wins) and the checkpoint skips
    already-processed input."""
    from orion_spark.streaming import curation as C

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "curated")
    ck = str(tmp_path / "ck")
    good = (
        "the quick brown fox jumps over the lazy dog and keeps running\n"
        "another long and reasonably clean line of english text here"
    )
    rows1 = [
        (1, good, "en", "s1", len(good)),
        (2, "short junk", "en", "s1", 10),                      # quality gate
        (3, good, "en", "s2", len(good)),                        # exact dup of 1
        (4, good + "\nthis line mentions javascript stuff only", "en", "s1", 10),
    ]
    spark.createDataFrame(rows1, C.DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    C.run_curation_stream(spark, src, out, ck)
    first = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    # 1 survives; 3 deduped against 1 (same clean text, min id wins);
    # 4's javascript line is stripped -> same clean text -> deduped too
    assert set(first) == {1}
    assert "javascript" not in first[1].clean_text

    # second wave: one genuinely new doc + a replay-equivalent dup
    other = (
        "the completely different document has another long english sentence\n"
        "and the second line of this document is also long and quite clean"
    )
    rows2 = [(9, other, "en", "s3", len(other)), (10, good, "en", "s3", len(good))]
    spark.createDataFrame(rows2, C.DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    C.run_curation_stream(spark, src, out, ck)
    final = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert final == [1, 9]  # 10 deduped cross-batch against the sink


def test_streaming_curation_perplexity_gate(spark, tmp_path):
    """The persisted-LM perplexity gate inside the foreachBatch sink:
    docs scoring above the bits-per-token ceiling are dropped; in-dist
    docs pass. The LM artifact is trained offline (save_lm_model) and
    the stream joins it — the production stream-static shape."""
    from orion_spark.llm.textstats import ngram_lm_score, save_lm_model
    from orion_spark.streaming import curation as C

    # reference corpus: clean english the gate should consider "normal"
    ref_line = (
        "the quick brown fox jumps over the lazy dog and keeps running fast"
    )
    ref = spark.createDataFrame(
        [(i, ref_line) for i in range(6)], "doc_id long, text string"
    )
    lm_path = str(tmp_path / "lm")
    save_lm_model(ref, lm_path)

    good = ref_line + "\n" + ref_line
    # passes quality/lang gates but is OOV word salad for the LM
    weird = (
        "zyx wvu tsr qpo nml kji hgf edc bax zzq the of and to in a\n"
        "qqz zzt rrp ppw wws ssd ddf ffg ggh hhj the of and to in a"
    )
    # pick the ceiling between the two measured scores so the test pins
    # the gate, not the corpus
    scored = {
        r.doc_id: r.bits_per_token
        for r in ngram_lm_score(
            ref,
            spark.createDataFrame(
                [(1, good.replace("\n", " ")), (2, weird.replace("\n", " "))],
                "doc_id long, text string",
            ),
        ).collect()
    }
    assert scored[1] < scored[2]
    ceiling = (scored[1] + scored[2]) / 2

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows = [
        (1, good, "en", "s1", len(good)),
        (2, weird, "en", "s1", len(weird)),
    ]
    spark.createDataFrame(rows, C.DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    C.run_curation_stream(
        spark, src, out, ck,
        lm_model_path=lm_path, max_bits_per_token=ceiling,
        min_quality=0.0,
    )
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1]


def test_streaming_curation_dsir_gate(spark, tmp_path):
    """The persisted-DSIR target-likeness gate inside the foreachBatch
    sink: pool docs below the log-weight floor are dropped, target-like
    docs pass. Model fit offline (save_dsir_model), stream joins the
    kilobyte ratio dim — same stream-static shape as the LM gate."""
    from orion_spark.llm.dsir import save_dsir_model, score_with_dsir_model
    from orion_spark.streaming import curation as C

    tline = "the gene encodes a protein kinase that binds the receptor domain"
    oline = "the stock market futures traded lower on weak earnings guidance"
    target = spark.createDataFrame(
        [(i, tline) for i in range(5)], "doc_id long, text string"
    )
    pool = spark.createDataFrame(
        [(100, tline), (101, oline)], "doc_id long, text string"
    )
    mpath = str(tmp_path / "dsir_model")
    save_dsir_model(target, pool, mpath, num_buckets=256)
    scored = {
        r.doc_id: r.log_weight
        for r in score_with_dsir_model(spark, pool, mpath).collect()
    }
    assert scored[100] > scored[101]
    floor = (scored[100] + scored[101]) / 2

    src, out, ck = (str(tmp_path / x) for x in ("src", "out", "ck"))
    good = tline + "\n" + tline
    bad = oline + "\n" + oline
    rows = [
        (100, good, "en", "s1", len(good)),
        (101, bad, "en", "s1", len(bad)),
    ]
    spark.createDataFrame(rows, C.DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    C.run_curation_stream(
        spark, src, out, ck,
        dsir_model_path=mpath, min_log_weight=floor,
        min_quality=0.0,
    )
    kept = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert kept == [100]


def test_streaming_bloom_standing_gate(spark, tmp_path):
    """The Bloom-history gate as a STANDING gate (round-8 verdict ask #8):
    a persisted bitmap built offline drops already-ingested docs per
    micro-batch, and with update_bloom_history=True each batch's
    survivors are folded back — so a SECOND stream run with a fresh sink
    and fresh checkpoint (no sink anti-join, no replay state) still drops
    them: the dedup guarantee travels in the bitmap alone."""
    from orion_spark.llm.bloom import bloom_build, bloom_probe, load_bloom, save_bloom
    from orion_spark.streaming import curation as C

    hist_text = (
        "the historical document line is long clean english text right here\n"
        "a second long clean line keeps the quality gate comfortably happy"
    )
    new_text = (
        "the genuinely new document arrives with one long english sentence\n"
        "and brings along another long and reasonably clean second line"
    )
    later_text = (
        "the second wave document is different again with long english text\n"
        "its other line is also long enough to clear every curation gate"
    )
    m_bits, k = 1 << 16, 4
    bloom_path = str(tmp_path / "bloom")
    hist = spark.createDataFrame([(hist_text,)], "clean_text string")
    save_bloom(
        bloom_build(hist, key_col="clean_text", m_bits=m_bits, k=k),
        bloom_path, m_bits=m_bits, k=k,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, hist_text, "en", "s1", len(hist_text)),
         (2, new_text, "en", "s1", len(new_text))],
        C.DOCS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    C.run_curation_stream(
        spark, src, out, ck,
        bloom_history_path=bloom_path, update_bloom_history=True,
    )
    landed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert landed == {2}  # doc 1 dropped by the history bitmap

    # persisted-bitmap round-trip: the survivor's key is now IN the bitmap
    bloom, m2, k2 = load_bloom(spark, bloom_path)
    assert (m2, k2) == (m_bits, k)
    probe = bloom_probe(
        spark.createDataFrame([(new_text,), (later_text,)],
                              "clean_text string"),
        bloom, "clean_text", m2, k2,
    ).collect()
    hits = {r.clean_text: r.bloom_hit for r in probe}
    assert hits[new_text] is True       # folded by the standing gate
    assert hits[later_text] is False    # unseen text stays clean

    # second run: FRESH sink + FRESH checkpoint (no anti-join history, no
    # replay state) — only the bitmap can drop the re-ingested text
    src2 = str(tmp_path / "src2")
    out2 = str(tmp_path / "out2")
    ck2 = str(tmp_path / "ck2")
    spark.createDataFrame(
        [(7, new_text, "en", "s9", len(new_text)),
         (8, later_text, "en", "s9", len(later_text))],
        C.DOCS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src2)
    C.run_curation_stream(
        spark, src2, out2, ck2,
        bloom_history_path=bloom_path, update_bloom_history=True,
    )
    landed2 = {r.doc_id for r in spark.read.parquet(out2).collect()}
    assert landed2 == {8}  # 7 dropped by the UPDATED bitmap alone


def test_streaming_url_history_gate(spark, tmp_path):
    """Canonical-URL standing gate: a persisted Bloom of previously
    fetched canonical URLs drops re-spelled re-fetches BEFORE text
    processing, intra-batch spelling variants collapse to one fetch, and
    update_url_bloom=True folds survivors back so a SECOND run (fresh
    sink, fresh checkpoint) drops yet another spelling of them."""
    from orion_spark.llm.bloom import bloom_build, save_bloom
    from orion_spark.llm.urls import canonicalize_url
    from orion_spark.streaming import curation as C

    def long_text(tag):
        return (
            f"the {tag} document line is long clean english text right here\n"
            "a second long clean line keeps the quality gate comfortably happy"
        )

    m_bits, k = 1 << 16, 4
    url_bloom = str(tmp_path / "url_bloom")
    hist = spark.createDataFrame(
        [("http://known.com/page?a=1",)], "u string"
    ).select(canonicalize_url(F.col("u")).alias("cu"))
    save_bloom(
        bloom_build(hist, key_col="cu", m_bits=m_bits, k=k),
        url_bloom, m_bits=m_bits, k=k,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows = [
        # re-spelled re-fetch of the historical page -> dropped by bitmap
        (1, long_text("first"), "en", "s1", 120,
         "HTTP://WWW.Known.COM:80/page/?utm_x=9&a=1#frag"),
        # two spellings of ONE new page -> intra-batch collapse, min id kept
        (2, long_text("second"), "en", "s1", 120,
         "https://new.com/story?b=2&a=1"),
        (3, long_text("third"), "en", "s1", 120,
         "https://WWW.new.com/story/?a=1&b=2&fbclid=zz"),
        # distinct new page -> kept
        (4, long_text("fourth"), "en", "s1", 120, "https://other.com/x"),
    ]
    spark.createDataFrame(rows, C.DOCS_URL_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    C.run_curation_stream(
        spark, src, out, ck,
        url_bloom_path=url_bloom, update_url_bloom=True,
    )
    landed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert landed == {2, 4}
    assert "_canon_url" not in spark.read.parquet(out).columns

    # second wave, FRESH sink + checkpoint: a third spelling of doc 2's
    # page must be dropped by the bitmap alone (standing-gate property)
    src2, out2, ck2 = (str(tmp_path / p) for p in ("src2", "out2", "ck2"))
    rows2 = [
        (5, long_text("fifth"), "en", "s1", 120,
         "https://NEW.com:443/story?a=1&b=2&utm_y=7"),
        (6, long_text("sixth"), "en", "s1", 120, "https://fresh.com/y"),
    ]
    spark.createDataFrame(rows2, C.DOCS_URL_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(src2)
    C.run_curation_stream(
        spark, src2, out2, ck2,
        url_bloom_path=url_bloom, update_url_bloom=True,
    )
    landed2 = {r.doc_id for r in spark.read.parquet(out2).collect()}
    assert landed2 == {6}


def test_streaming_domain_blocklist_gate(spark, tmp_path):
    """UT1-style domain gate as the FIRST sink gate: a doc from a blocked
    domain's subdomain is dropped before any history probing; the
    per-gate metrics attribute the drop to blocklist_gate."""
    import json as _json

    from orion_spark.streaming import curation as C

    good = (
        "the allowed document has one long clean english line right here\n"
        "and a second long line that keeps the quality gate clearly happy"
    )
    bad = (
        "the blocked document also has one long clean english line here\n"
        "with a second long line that would otherwise pass every gate"
    )
    bl_path = str(tmp_path / "blocklist")
    spark.createDataFrame([("spam.bad.org",)], "domain string").write.parquet(
        bl_path
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    metrics = str(tmp_path / "metrics.jsonl")
    spark.createDataFrame(
        [
            (1, good, "en", "s1", len(good), "http://news.example.com/a"),
            (2, bad, "en", "s1", len(bad), "http://cdn.spam.bad.org/b"),
        ],
        C.DOCS_URL_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    C.run_curation_stream(
        spark, src, out, ck,
        domain_blocklist_path=bl_path, metrics_path=metrics,
    )
    landed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert landed == {1}
    rec = _json.loads(open(metrics).readline())
    assert rec["input"] == 2 and rec["blocklist_gate"] == 1


def test_streaming_standing_bloom_skips_sink_reread(spark, tmp_path):
    """With the content bloom as a standing gate, the O(corpus)-per-
    trigger sink re-read is skipped by default — and the survivors are
    IDENTICAL to strict_exact=True on the same two-wave feed, because
    the bitmap has no false negatives on the clean-text identity the
    anti-join keys on (VERDICT r10 item 7)."""
    from orion_spark.llm.bloom import bloom_build, save_bloom
    from orion_spark.streaming import curation as C

    text_x = (
        "wave one document x carries a long clean english sentence here\n"
        "plus a second long line that keeps the quality gate quite happy"
    )
    text_y = (
        "wave one document y is different but equally long english text\n"
        "and its second line is also long enough for every funnel gate"
    )
    text_z = (
        "wave two document z arrives later with its own long english line\n"
        "followed by another long and reasonably clean second sentence"
    )
    m_bits, k = 1 << 16, 4

    def _run_two_waves(tag, strict):
        # fresh empty-ish bitmap per variant (one sentinel key)
        bloom_path = str(tmp_path / f"bloom_{tag}")
        sentinel = spark.createDataFrame(
            [("sentinel never in corpus",)], "clean_text string"
        )
        save_bloom(
            bloom_build(sentinel, key_col="clean_text", m_bits=m_bits, k=k),
            bloom_path, m_bits=m_bits, k=k,
        )
        src = str(tmp_path / f"src_{tag}")
        out = str(tmp_path / f"out_{tag}")
        ck = str(tmp_path / f"ck_{tag}")
        spark.createDataFrame(
            [(1, text_x, "en", "s1", len(text_x)),
             (2, text_y, "en", "s1", len(text_y))],
            C.DOCS_SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(src)
        C.run_curation_stream(
            spark, src, out, ck,
            bloom_history_path=bloom_path, update_bloom_history=True,
            strict_exact=strict,
        )
        # wave two: doc 3 re-ingests text_x verbatim — only the folded
        # bitmap (default) or the sink re-read (strict) can drop it
        spark.createDataFrame(
            [(3, text_x, "en", "s2", len(text_x)),
             (4, text_z, "en", "s2", len(text_z))],
            C.DOCS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(src)
        C.run_curation_stream(
            spark, src, out, ck,
            bloom_history_path=bloom_path, update_bloom_history=True,
            strict_exact=strict,
        )
        return {r.doc_id for r in spark.read.parquet(out).collect()}

    fast = _run_two_waves("fast", strict=False)
    strict = _run_two_waves("strict", strict=True)
    assert fast == strict == {1, 2, 4}


def test_near_dup_r1_drop_gate_warns(spark, tmp_path):
    """Wiring a rows_per_band=1 band store as the streaming drop gate
    emits a loud warning (the maximal-recall candidate-generation
    setting over-drops merely-similar docs; ADVICE r10); an r=4 store
    wires silently."""
    import warnings as _w

    import pytest

    from orion_spark.llm.near_dup_history import band_store_build, save_band_store
    from orion_spark.streaming import curation as C

    hist = spark.createDataFrame(
        [(0, "one long historical sentence with many plain english words inside")],
        "doc_id long, text string",
    )
    p1 = str(tmp_path / "store_r1")
    save_band_store(band_store_build(hist, text_col="text"), p1)
    with pytest.warns(UserWarning, match="rows_per_band=1"):
        C.curated_dedup_sink(spark, str(tmp_path / "o1"), str(tmp_path / "c1"),
                             near_dup_store_path=p1)
    p4 = str(tmp_path / "store_r4")
    save_band_store(
        band_store_build(hist, text_col="text", rows_per_band=4),
        p4, rows_per_band=4,
    )
    with _w.catch_warnings():
        _w.simplefilter("error")
        C.curated_dedup_sink(spark, str(tmp_path / "o4"), str(tmp_path / "c4"),
                             near_dup_store_path=p4)
