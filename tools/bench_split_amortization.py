#!/usr/bin/env python
"""Measured inline-vs-injected walls for documents_leakage_free_split
(round-9 verdict ask #7: the sf0.1/sf1 rows exist; this adds the sf10
point so the amortization claim has a large-scale number).

Two paths over the same documents table:
- inline: leakage_free_split(docs) — runs the full MinHash-LSH ->
  path-halving-components chain per invocation;
- injected: a prior pass's (doc_id, cluster_id) labels are persisted
  once, then leakage_free_split(docs, clusters=persisted) is one md5
  projection + a doc-keyed left join.

Each path runs `runs` times in one session (report every wall: first
run carries the page-cache cold cost, later runs are warm — same
discipline as the cold/warm stage-metrics harness). The assignments are
asserted identical between paths before anything is timed. Keep other
Spark JVMs idle.

Usage: python tools/bench_split_amortization.py [sf_dir] [runs]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    workdir = "/tmp/orion_split_amortization"

    from orion_spark.llm.dedup import (
        dedup_clusters,
        leakage_free_split,
        minhash_lsh_pairs,
    )
    from orion_spark.session import autoscale_shuffle, get_spark

    spark = get_spark(app_name="orion-split-amortization")
    spark.sparkContext.setLogLevel("ERROR")
    autoscale_shuffle(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    if os.path.exists(workdir):
        shutil.rmtree(workdir)
    cluster_path = os.path.join(workdir, "clusters")

    # persist the labels once (the CLI's --save-clusters path); timed so
    # the one-off amortization cost is on the record too
    t0 = time.time()
    dedup_clusters(minhash_lsh_pairs(docs, threshold=0.5)).write.parquet(
        cluster_path
    )
    persist_s = round(time.time() - t0, 2)
    persisted = spark.read.parquet(cluster_path)

    # identity: inline and injected must produce the same assignment
    inline_df = leakage_free_split(docs)
    injected_df = leakage_free_split(docs, clusters=persisted)
    mismatches = (
        inline_df.join(injected_df, "doc_id")
        .where(
            (inline_df["cluster"] != injected_df["cluster"])
            | (inline_df["split"] != injected_df["split"])
        )
        .count()
    )
    assert mismatches == 0, f"{mismatches} assignment mismatches"

    out: dict = {
        "metric": "split_amortization",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "persist_clusters_s": persist_s,
    }
    for label, fn in (
        ("inline", lambda: leakage_free_split(docs)),
        ("injected", lambda: leakage_free_split(docs, clusters=persisted)),
    ):
        walls = []
        for _ in range(runs):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        out[label] = walls
    out["amortization_x"] = round(min(out["inline"]) / min(out["injected"]), 1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
