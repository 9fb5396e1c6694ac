"""Bucketed co-located joins: the write-once-shuffle-never contract is
asserted against the physical plan, with broadcast disabled so the join
can't cheat its way out of the exchange."""

import pytest


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    from pyspark.sql import functions as F

    from orion_spark.sources.bucketing import read_table, write_bucketed_bundle

    nodes = spark.range(200).select(
        F.concat(F.lit("N:"), F.col("id")).alias("id"),
        F.col("id").cast("string").alias("name"),
    )
    edges = spark.range(1000).select(
        F.concat(F.lit("N:"), (F.col("id") % 200)).alias("subject"),
        F.lit("biolink:related_to").alias("predicate"),
        F.concat(F.lit("N:"), ((F.col("id") * 7) % 200)).alias("object"),
    )
    nt, et = write_bucketed_bundle(
        nodes, edges, str(tmp_path / "bundle"), prefix="t_bkt", num_buckets=4
    )
    n, e = read_table(spark, nt), read_table(spark, et)
    joined = e.join(n, e["subject"] == n["id"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: bucket metadata used
    assert joined.count() == 1000
    spark.sql(f"DROP TABLE IF EXISTS {nt}")
    spark.sql(f"DROP TABLE IF EXISTS {et}")


def test_bucketed_groupby_reuses_clustering(spark, tmp_path, no_broadcast):
    """Aggregation on the bucket key also skips its exchange — the A7
    adjacency build over bucketed edges is shuffle-free."""
    from pyspark.sql import functions as F

    from orion_spark.sources.bucketing import read_table, write_bucketed_table

    edges = spark.range(1000).select(
        F.concat(F.lit("N:"), (F.col("id") % 50)).alias("subject"),
        F.col("id").alias("x"),
    )
    write_bucketed_table(
        edges, "t_bkt_agg", str(tmp_path / "agg"), ["subject"], 4,
        sort_cols=["subject"],
    )
    e = read_table(spark, "t_bkt_agg")
    agg = e.groupBy("subject").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 50
    spark.sql("DROP TABLE IF EXISTS t_bkt_agg")
