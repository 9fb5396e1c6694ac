"""Bucketed bundle tables: co-located joins without a shuffle.

At 100 TB the recurring cost in the build pipeline is re-shuffling the
edge table on its join keys — every normalization lookup, endpoint-type
join (J6), and adjacency build (A7) clusters on `subject`/`object`/`id`.
Hive-style bucketing amortizes that: write nodes bucketed by `id` and
edges bucketed by `subject` with the SAME bucket count, and every
downstream equi-join on those keys is planned as a zero-Exchange
sort-merge join (plan-asserted in tests/test_bucketing.py). The shuffle
is paid once at write time, then every consumer — QC, meta-KG, AC
adjacency, incremental merge — reads pre-clustered data.

The reference has no analogue (single-process dict lookups —
orion/kgx_file_merger.py); this is the Spark-native replacement for
"keep the node map in memory".

Bucket-count sizing: buckets are the parallelism floor for every
downstream join — pick ~2-4x the cluster's executor-core count, and keep
per-bucket bytes under a few hundred MB (at 100 TB of edges that's
O(100k) buckets; the default here is test-scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as an external parquet table bucketed (and optionally
    sorted within buckets) on `bucket_cols`. Sorting by the bucket key
    lets the sort-merge join skip its per-partition Sort too."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_bucketed_bundle(
    nodes: DataFrame,
    edges: DataFrame,
    base_path: str,
    prefix: str = "kgx",
    num_buckets: int = 8,
) -> tuple[str, str]:
    """Write a KGX bundle as co-bucketed tables: nodes on `id`, edges on
    `subject` — the J5/J6/A7 join pattern. Returns (nodes_table,
    edges_table) names registered in the session catalog."""
    nt, et = f"{prefix}_nodes_bucketed", f"{prefix}_edges_bucketed"
    write_bucketed_table(
        nodes, nt, f"{base_path}/nodes", ["id"], num_buckets, sort_cols=["id"]
    )
    write_bucketed_table(
        edges, et, f"{base_path}/edges", ["subject"], num_buckets,
        sort_cols=["subject"],
    )
    return nt, et


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucketing metadata (a plain
    spark.read.parquet on the path would discard it and re-shuffle)."""
    return spark.table(table)
