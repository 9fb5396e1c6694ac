"""One-shot evidence run for the span-rewrite rebuild fix (round 8).

The sf* document fixtures cap at ~109 tokens, which hides the rebuild
term: the old rebuild filtered the token array with
`~F.array_contains(_rm, i)` — O(tokens x removed positions) PER
DOCUMENT, quadratic on long heavily-duplicated documents. The new
rebuild gap-slices over the sorted duplicate starts —
O(tokens + dup occurrences).

This script synthesizes a long-document corpus (docs of >= 10k tokens,
half of each document verbatim-shared so roughly half the positions are
removed), then times the CURRENT duplicate_span_rewrite against an
inline reconstruction of the OLD rebuild (same window/rank/aggregate
stages, old filter), on identical inputs. Prints one JSON line.

Usage: python tools/bench_longdoc_span.py [n_docs] [tokens_per_doc]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def old_rebuild(df: DataFrame, n: int = 8) -> DataFrame:
    """The pre-round-8 rebuild, reconstructed verbatim for the A/B:
    aggregate dup starts, expand to covered positions in-row, then a
    per-token array_contains filter (the removed quadratic term)."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = df.select(
        F.col("doc_id"), toks.alias("_toks"), F.size(toks).alias("n_tokens")
    )
    win = base.where(F.col("n_tokens") >= n).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_tokens") - n + 1),
                lambda i: F.md5(F.array_join(F.slice(F.col("_toks"), i, n), " ")),
            )
        ).alias("_pos0", "_h"),
    ).select("doc_id", (F.col("_pos0") + 1).alias("start"), "_h")
    w = Window.partitionBy("_h").orderBy("doc_id", "start")
    dup_occ = win.withColumn("rk", F.row_number().over(w)).where(F.col("rk") >= 2)
    removed = dup_occ.groupBy("doc_id").agg(F.collect_list("start").alias("_ss"))
    rm_expand = F.array_distinct(
        F.flatten(
            F.transform(F.col("_ss"), lambda s: F.sequence(s, s + F.lit(n - 1)))
        )
    )
    joined = base.join(removed, "doc_id", "left").withColumn(
        "_rm", F.coalesce(rm_expand, F.array().cast("array<int>"))
    )
    return joined.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.size("_rm").cast("bigint").alias("n_removed"),
        F.array_join(
            F.filter(
                F.col("_toks"),
                lambda x, i: ~F.array_contains(F.col("_rm"), (i + 1).cast("int")),
            ),
            " ",
        ).alias("new_text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("ORION_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    half = tokens // 2
    # half of every doc is a corpus-wide shared block (verbatim, so every
    # window inside it duplicates); the other half is per-doc unique
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(half)),
                        lambda i: F.concat(F.lit("s"), (i % 997).cast("string")),
                    ),
                    " ",
                ),
                F.lit(" "),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(tokens - half)),
                        lambda i: F.concat(
                            F.lit("u"), F.col("id"), F.lit("_"), i.cast("string")
                        ),
                    ),
                    " ",
                ),
            ).alias("text"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    docs.count()

    from orion_spark.llm.dedup import duplicate_span_rewrite

    out = {}
    for name, fn in (("new_gap_slice", duplicate_span_rewrite), ("old_array_contains", old_rebuild)):
        t0 = time.time()
        fn(docs, n=8).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    out.update(
        {
            "n_docs": n_docs,
            "tokens_per_doc": tokens,
            "speedup": round(out["old_array_contains"] / out["new_gap_slice"], 2),
        }
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
