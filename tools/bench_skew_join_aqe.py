#!/usr/bin/env python
"""AQE skew-join A/B on the registered power-law fixture (round 9).

SURVEY §4 claims "AQE skew-join handling" as a skew defense; this run
puts a number behind it on the SAME fixture family the sweep gate uses
(plans/skewgraph.skew_edges_for_n). Shape: the fixture's HUB TIER
(edges with b >= n — hub 0 alone owns ~30% of these rows) keyed by the
hub side joins a node-property dim too large to broadcast, each edge
row carrying an incompressible ~192-byte payload, followed by per-row
sha2 scoring inside the reduce stage — the realistic "join then score"
shape where one straggler partition owns the critical path.

Two calibration findings baked in (both cost an afternoon to learn):
- the payload must be INCOMPRESSIBLE: skew detection reads
  post-compression map-output sizes, and a constant pad deflates to
  nothing, leaving the hot partition under the threshold (measured:
  speedup 1.0x, zero skew=true markers in the executed plan);
- skewedPartitionThresholdInBytes is scaled to 32 MB (advisory 16 MB)
  because a local fixture's ABSOLUTE partition sizes are two orders of
  magnitude below a 100 TB corpus's — the 5x-median RATIO test, which
  is what actually identifies the hub, is untouched; at real scale the
  default 256 MB gate fires on its own.

With skewJoin.enabled=false the hot partition is one straggler task
(~9x the fair per-core share) while the other cores drain; with true,
AQE splits it at runtime (SortMergeJoin(skew=true) in the executed
plan). Both arms produce the identical aggregate (asserted). Measured
on this box: off 9.1-14.6 s vs on 4.0-4.1 s => 2.3-2.5x. Prints one
JSON line. Keep other Spark JVMs idle.

Usage: python tools/bench_skew_join_aqe.py [n_base] [runs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config(
            "spark.driver.memory",
            os.environ.get("ORION_SPARK_DRIVER_MEM", "24g"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # keep the dim on the shuffle path: the demo is the sort-merge
        # join's hot partition, not a broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from orion_spark.plans.skewgraph import N_HUBS, skew_edges_for_n

    pad = F.repeat(F.md5(F.concat_ws(":", F.col("a"), F.col("b"))), 6)
    # hub tier only: the balanced circulant base would dilute the hot key
    # to ~10% of rows (theoretical ceiling 1.15x); on the hub tier hub 0
    # is ~30% of rows and the straggler owns the critical path
    edges = (
        skew_edges_for_n(spark, n)
        .where(F.col("b") >= n)
        .select("a", "b", pad.alias("pad"))
    )
    dim = spark.range(n + N_HUBS).select(
        F.col("id").alias("node"),
        (F.col("id") % 97).alias("node_prop"),
    )
    n_edges = edges.count()

    def job():
        joined = edges.join(dim, edges["b"] == dim["node"])
        return joined.agg(
            F.count("*").alias("rows"),
            F.sum("node_prop").alias("prop_sum"),
            F.sum(F.length(F.sha2(F.col("pad"), 256))).alias("score_sum"),
        ).collect()[0]

    out = {"n_base": n, "n_edges": n_edges, "pad_bytes": 192}
    results = {}
    for label, enabled in (("skew_join_off", "false"), ("skew_join_on", "true")):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
        walls, row = [], None
        for _ in range(runs):
            t0 = time.time()
            row = job()
            walls.append(round(time.time() - t0, 2))
        results[label] = (row["rows"], row["prop_sum"], row["score_sum"])
        out[label] = walls
    assert results["skew_join_off"] == results["skew_join_on"], results
    out["rows"], out["prop_sum"], out["score_sum"] = results["skew_join_on"]
    out["speedup_best"] = round(
        min(out["skew_join_off"]) / min(out["skew_join_on"]), 2
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
