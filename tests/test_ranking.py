"""operators/ranking.py: the two-phase bucketed global rank / NTILE must be
BIT-IDENTICAL to the single-partition ``Window.orderBy`` forms it replaces,
including the SQL-standard uneven-tile split (first n%k tiles get the extra
row), descending orders via negated buckets, and degenerate bucketings
(every row in one bucket / every row its own bucket)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from orion_spark.operators.ranking import bucketed_global_rank, scalable_ntile

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_totalprice", "o_custkey")
    )


def _reference_ntile(df, n, order_exprs, out_col):
    return df.withColumn(out_col, F.ntile(n).over(Window.orderBy(*order_exprs)))


def _assert_same(a, b, keys):
    left = {tuple(r) for r in a.select(*keys).collect()}
    right = {tuple(r) for r in b.select(*keys).collect()}
    assert left == right


def test_rank_matches_row_number_ascending(spark):
    df = _orders(spark)
    got = bucketed_global_rank(
        df,
        F.floor(F.col("o_totalprice") / 1000),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        rank_col="rk",
    )
    ref = df.withColumn(
        "rk", F.row_number().over(Window.orderBy("o_totalprice", "o_orderkey"))
    )
    _assert_same(got, ref, ["o_orderkey", "rk"])


def test_rank_total_col_is_count(spark):
    df = _orders(spark)
    n = df.count()
    got = bucketed_global_rank(
        df,
        F.floor(F.col("o_totalprice") / 1000),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        rank_col="rk",
        total_col="n",
    )
    assert got.select("n").distinct().collect() == [(n,)]
    # ranks are a permutation of 1..n
    assert got.agg(F.min("rk"), F.max("rk"), F.count_distinct("rk")).first() == (
        1,
        n,
        n,
    )


@pytest.mark.parametrize("k", [3, 5, 7, 10])
def test_ntile_matches_builtin_ascending(spark, k):
    df = _orders(spark)
    got = scalable_ntile(
        df,
        k,
        F.floor(F.col("o_totalprice") / 500),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        "tile",
    )
    ref = _reference_ntile(df, k, ["o_totalprice", "o_orderkey"], "tile")
    _assert_same(got, ref, ["o_orderkey", "tile"])


def test_ntile_matches_builtin_descending_negated_bucket(spark):
    df = _orders(spark)
    got = scalable_ntile(
        df,
        5,
        -F.col("o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        "tile",
    )
    ref = _reference_ntile(
        df, 5, [F.desc("o_totalprice"), F.asc("o_orderkey")], "tile"
    )
    _assert_same(got, ref, ["o_orderkey", "tile"])


def test_ntile_uneven_split_exact(spark):
    """n=7, k=3 -> tile sizes 3,2,2 (first n%k tiles take the extra row)."""
    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(1, 8)], ["id", "v"]
    )
    got = scalable_ntile(df, 3, F.col("v"), [F.asc("v"), F.asc("id")], "tile")
    sizes = {
        r.tile: r.n
        for r in got.groupBy("tile").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {1: 3, 2: 2, 3: 2}


@pytest.mark.parametrize(
    "bucket_factory",
    # one giant bucket / one row per bucket (columns built lazily — no
    # SparkContext exists at collection time)
    [lambda: F.lit(0) + F.lit(0), lambda: F.col("id")],
    ids=["one-bucket", "bucket-per-row"],
)
def test_ntile_degenerate_bucketings(spark, bucket_factory):
    df = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(1, 24)], ["id", "v"]
    )
    # coarse constant bucket is only correct when monotone: use id order
    got = scalable_ntile(df, 4, bucket_factory(), [F.asc("id")], "tile")
    ref = _reference_ntile(df, 4, ["id"], "tile")
    _assert_same(got, ref, ["id", "tile"])


def test_no_unpartitioned_window_in_plan(spark):
    """The point of the module: the executed plan must contain no window
    with an empty partitionSpec over the fact table. Every windowspec in
    the plan partitions by something (the bucket, or the fold-proof
    constant over the tiny bucket-dimension table)."""
    df = _orders(spark)
    got = scalable_ntile(
        df,
        5,
        F.floor(F.col("o_totalprice") / 1000),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        "tile",
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the single-partition WindowExec never sees the full fact table: every
    # window in the plan partitions by _bkt (fact side, parallel) or the
    # fold-proof constant `_bkt % 1` (bucket dimension table, tiny)
    window_lines = [
        ln for ln in plan.splitlines() if ln.lstrip("+- ").startswith("Window ")
    ]
    assert window_lines, "expected Window nodes in the plan"
    for ln in window_lines:
        assert "_bkt" in ln, f"unpartitioned window over the fact table: {ln}"
