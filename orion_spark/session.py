"""SparkSession factory with scale-oriented defaults.

Tuned for correctness on local[N] while carrying the configuration that
matters on a 1000-executor cluster: AQE (runtime re-planning, skew-join
splitting, partition coalescing), sensible shuffle partitioning, Arrow for
any pandas exchange, and broadcast-join thresholds.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "orion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults come from env so the same code runs in tests (local[32]) and on
    a cluster (spark-submit sets master externally).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("ORION_SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing + skew-join handling. At 100 TB
        # the hub-node property merge (biolink:NamedThing-scale keys) skews;
        # AQE splits those partitions instead of OOMing one executor.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas_udf / mapInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast dimension tables (closure tables, norm maps) up to 64 MB.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Don't let tiny local runs produce thousands of output files.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # the events table stores TIMESTAMP(NANOS) which vanilla Spark
        # rejects; read as long (ns) and convert explicitly where needed
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("ORION_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
