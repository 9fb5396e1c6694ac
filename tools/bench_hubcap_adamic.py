"""One-shot evidence run for the adamic_adar max_degree hub cap (round 8).

The registered co-occurrence fixture turns out to have a SCALE-INVARIANT
degree distribution (gen_scale clones rows under fresh keys, so sf10's
graph has the same max degree 13 / p99 7 as sf0.01 — measured round 8),
which means the hub cap is a near-no-op there and round 7's "12.8x =
wedge densification" attribution was wrong (the decomposition shows both
the pairs stage and the wedge stage growing ~linearly with overhead).

The cap exists for POWER-LAW graphs, where the wedge self-join on a
shared-neighbor key fans out quadratically in hub degree: one degree-d
hub contributes d*(d-1)/2 wedge rows. This script builds a synthetic
hub graph — `n_base` bounded-degree edges plus `n_hubs` hubs of degree
`hub_degree` each — and times adamic_adar uncapped vs max_degree=16.
Expected: uncapped wall explodes with hub_degree (hub wedge rows =
n_hubs * hub_degree^2 / 2); capped stays flat. Prints one JSON line.

Usage: python tools/bench_hubcap_adamic.py [n_hubs] [hub_degree]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    n_hubs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hub_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_base = 3_000_000  # exactly 1M nodes x offsets {1, 2, 3}
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("ORION_SPARK_DRIVER_MEM", "16g"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # bounded-degree background: 1M-node circulant graph with offsets
    # 1/2/3 (degree ~6, well under the cap), which yields ~2M genuine
    # adamic-adar predictions ((a, a+4) and (a, a+5) pairs share two
    # offset-neighbors each) — so the capped/uncapped outputs are
    # nonzero AND identical, isolating the hub term as pure cost
    base = spark.range(n_base).select(
        (F.col("id") % 1_000_000).alias("a"),
        (
            (F.col("id") % 1_000_000 + 1 + F.floor(F.col("id") / 1_000_000))
            % 1_000_000
        ).alias("b"),
    )
    # hubs: node 2_000_000+h connects to hub_degree spoke nodes
    hubs = spark.range(n_hubs * hub_degree).select(
        (F.lit(2_000_000) + (F.col("id") % n_hubs)).alias("a"),
        (F.lit(3_000_000) + F.col("id")).alias("b"),
    )
    pairs = (
        base.unionAll(hubs)
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n_edges = pairs.count()

    from orion_spark.operators.graphalgo import adamic_adar

    out = {"n_edges": n_edges, "n_hubs": n_hubs, "hub_degree": hub_degree}
    for name, cap in (("capped_16", 16), ("uncapped", None)):
        t0 = time.time()
        n = adamic_adar(pairs, min_common=2, max_degree=cap).count()
        out[name] = {"rows": n, "sec": round(time.time() - t0, 2)}
    out["speedup"] = round(
        out["uncapped"]["sec"] / out["capped_16"]["sec"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
