#!/usr/bin/env python
"""A/B: content-key WINDOW plans (the round-9 shape) vs the round-10
partial-aggregatable rewrites, on the registered power-law text fixture
(plans/skewtext.py — one canonical URL / one boilerplate paragraph /
one shingle family owning half the corpus).

Window.partitionBy(<content key>) ships every occurrence of the hot key
into ONE task — the single shuffle AQE cannot skew-split, with no
partial aggregation. The rewrites (groupBy + min/min_by/count, join-back
where needed) pre-combine map-side, so the hot key reaches its reducer
as one row per map task. This tool times both arms on the same fixture
and asserts the results agree, so the SCALE.md row is a measured claim.

Usage: python tools/bench_dewindow_ab.py [n_docs] [runs]
  n_docs default 1_000_000 (the sf1-equivalent fixture size: hot key =
  500k occurrences); runs default 3 (best run reported, all printed).
"""

from __future__ import annotations

import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def url_dedup_windowed(docs: DataFrame) -> DataFrame:
    """The round-9 plan: count/min window over the canonical string."""
    from orion_spark.llm.urls import canonicalize_url, url_host

    w = Window.partitionBy("canon_url")
    canon = docs.select(
        "doc_id",
        canonicalize_url(F.col("url")).alias("canon_url"),
        url_host(F.col("url")).alias("host"),
    )
    return canon.select(
        "doc_id", "canon_url", "host",
        F.count(F.lit(1)).over(w).alias("group_size"),
        F.when(F.col("doc_id") == F.min("doc_id").over(w), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("kept"),
    )


def paragraph_rewrite_windowed(docs: DataFrame) -> DataFrame:
    """The round-9 plan: row_number window over md5(paragraph)."""
    paras = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "para"),
    ).where(F.trim("para") != "")
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "idx")
    kept = paras.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    totals = paras.groupBy("doc_id").agg(F.count("*").alias("n_paras"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("new_text"),
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_paras", F.lit(0)).cast("bigint").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("new_text", F.lit("")).alias("new_text"),
        )
    )


def ngram_novelty_windowed(docs: DataFrame) -> DataFrame:
    """The round-9 plan: min(doc_id) window over the shingle."""
    from orion_spark.llm.dedup import word_shingles

    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), k=3)).alias("shingle")
    )
    w = Window.partitionBy("shingle")
    marked = sh.select(
        "doc_id", (F.col("doc_id") == F.min("doc_id").over(w)).alias("_novel")
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("_novel"), 1).otherwise(0)).cast("long").alias("n_novel"),
    )


def _fingerprint(df: DataFrame, kind: str):
    if kind == "url":
        return df.agg(
            F.count("*"), F.sum("group_size"), F.sum("kept"),
            F.sum(F.crc32("canon_url")),
        ).first()
    if kind == "para":
        return df.agg(
            F.count("*"), F.sum("n_paras"), F.sum("n_kept"),
            F.sum(F.crc32("new_text")),
        ).first()
    return df.agg(
        F.count("*"), F.sum("n_shingles"), F.sum("n_novel")
    ).first()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from orion_spark.llm.textstats import ngram_novelty
    from orion_spark.llm.urls import url_dedup
    from orion_spark.plans.skewtext import skew_docs_for_n
    from orion_spark.session import get_spark

    spark = get_spark(app_name="dewindow-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from orion_spark.llm.dedup import paragraph_dedup_rewrite

    docs = skew_docs_for_n(spark, n).localCheckpoint(eager=True)
    print(f"fixture: {docs.count()} docs (hot key = {n // 2} occurrences)")

    arms = [
        ("url_dedup", "url",
         lambda: url_dedup(docs),
         lambda: url_dedup_windowed(docs)),
        ("paragraph_rewrite", "para",
         lambda: paragraph_dedup_rewrite(docs),
         lambda: paragraph_rewrite_windowed(docs)),
        ("ngram_novelty", "ngram",
         lambda: ngram_novelty(docs, k=3).drop("novelty"),
         lambda: ngram_novelty_windowed(docs)),
    ]
    for name, kind, agg_fn, win_fn in arms:
        fps = {}
        for arm, fn in (("agg", agg_fn), ("window", win_fn)):
            walls = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                walls.append(round(time.time() - t0, 2))
            fps[arm] = tuple(_fingerprint(fn(), kind))
            print(f"{name:20s} {arm:7s} walls={walls} best={min(walls)}")
        assert fps["agg"] == fps["window"], (name, fps)
        print(f"{name:20s} fingerprints identical: {fps['agg']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
