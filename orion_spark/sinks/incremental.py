"""Incremental bundle upsert (round-4 verdict ask #6).

`streaming.events.merge_upsert_sink` rewrites the WHOLE bundle every
micro-batch — correct, but at production scale a small delta against a
100 TB bundle must not touch 100 TB of files. The fix is a hash-sharded
layout plus Spark's dynamic partition overwrite:

- the bundle is written `partitionBy(_shard)` where
  `_shard = pmod(xxhash64(shard key), n_shards)`; the shard key is a
  pure function of the merge group key (edges: subject; nodes: id), so
  every row of a merge group lives in exactly one shard directory;
- an upsert computes the delta's touched shard set (bounded by
  n_shards — a manifest-sized collect), reads ONLY those partitions
  (partition pruning on `_shard`), re-runs the A3 property-merge
  aggregate (operators/merge.py) over existing+delta for those shards,
  and rewrites ONLY those partition directories via
  `spark.sql.sources.partitionOverwriteMode=dynamic`.

Cost is O(delta + touched shards), not O(bundle): with 4096 shards on a
100 TB bundle, a delta touching one hot source rewrites tens of GB.
This is the same layout contract as a Delta/Iceberg MERGE INTO with a
hash-bucketed table — expressed on plain parquet so the bundle stays
engine-neutral; the merge SEMANTICS (first-truthy-by-ordinal scalars,
sorted-distinct array union) are untouched A3.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "_shard"


def shard_of(key_cols: list[str], n_shards: int):
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_shards)).cast("int")


def write_sharded_bundle(
    df: DataFrame, path: str, key_cols: list[str], n_shards: int = 64
) -> None:
    """Initial (full) write of a hash-sharded bundle."""
    (
        df.withColumn(SHARD_COL, shard_of(key_cols, n_shards))
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(path)
    )


def read_sharded_bundle(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(SHARD_COL)


def upsert_sharded_bundle(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    key_cols: list[str],
    merge: Callable[[DataFrame], DataFrame],
    n_shards: int = 64,
    ordinal_col: str = "_source_ordinal",
) -> list[int]:
    """Merge *delta* into the sharded bundle at *path*, rewriting only the
    shard partitions the delta touches. Existing bundle rows get ordinal 0
    so on scalar conflicts the persisted value wins (the reference's
    first-truthy-by-source-order rule with the bundle as the earlier
    source); delta rows keep their own relative order shifted above the
    bundle (ordinal+1 if the delta carries one, else 1) — with that, an
    upsert is EXACTLY equivalent to a from-scratch merge of
    bundle-sources-then-delta, which the registry query
    incremental_upsert_merged_edges hash-checks against the
    kgx_merge_edges oracle. Returns the touched shard ids."""
    if ordinal_col in delta.columns:
        delta = delta.withColumn(
            ordinal_col, F.col(ordinal_col).cast("long") + 1
        )
    else:
        delta = delta.withColumn(ordinal_col, F.lit(1).cast("long"))
    delta = delta.withColumn(SHARD_COL, shard_of(key_cols, n_shards))
    touched = sorted(
        r[SHARD_COL] for r in delta.select(SHARD_COL).distinct().collect()
    )
    existing = spark.read.parquet(path).where(F.col(SHARD_COL).isin(touched))
    combined = existing.withColumn(ordinal_col, F.lit(0).cast("long")).unionByName(
        delta, allowMissingColumns=True
    )
    merged = merge(combined).withColumn(SHARD_COL, shard_of(key_cols, n_shards))

    conf = spark.conf
    prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(SHARD_COL).parquet(path)
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return touched


def upsert_sharded_edges(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    n_shards: int = 64,
    edge_merging_attributes: list[str] | None = None,
) -> list[int]:
    """Edge-bundle upsert with A3 merge semantics. Shards on subject — a
    pure function of the edge merge key, so merge groups never straddle
    shards and the per-shard aggregate is exact."""
    from orion_spark.operators.merge import merge_edges

    return upsert_sharded_bundle(
        spark, delta, path, ["subject"],
        lambda df: merge_edges(df, edge_merging_attributes),
        n_shards=n_shards,
    )


def upsert_sharded_nodes(
    spark: SparkSession, delta: DataFrame, path: str, n_shards: int = 64
) -> list[int]:
    from orion_spark.operators.merge import merge_nodes

    return upsert_sharded_bundle(
        spark, delta, path, ["id"], merge_nodes, n_shards=n_shards
    )
