"""Genomic-style range join (SURVEY §2.4 J8 pure-Spark alternative):
points (variant positions) × intervals (gene regions ± window).

A naive non-equi join (`pos BETWEEN start AND end`) forces Spark into
BroadcastNestedLoopJoin — O(points × intervals) comparisons, which dies at
scale. The classic fix is bin bucketing: both sides get genomic-bin keys
(pos div bin_size; intervals explode to every bin they overlap), the join
becomes an equi-join on (chrom, bin) that hash-partitions normally, and the
exact BETWEEN predicate filters within the (tiny) bin-collision set. Each
(point, interval) pair meets in exactly one bin — the point's — so no
post-join dedup is needed.

This replaces the reference's SNPEFF ±100kb variant→gene assignment
(orion/supplementation.py:138-144 ud-distance) with a native operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bin_size: int = 100_000,
    chrom_col: str = "chrom",
    pos_col: str = "pos",
    start_col: str = "start",
    end_col: str = "end",
    window: int = 0,
) -> DataFrame:
    """Inner-join each point to every interval containing it (intervals
    optionally widened by ±window, the SNPEFF up/downstream distance).
    Returns all point columns + all interval columns."""
    p = points.withColumn("_bin", (F.col(pos_col) / bin_size).cast("bigint"))
    lo = F.col(start_col) - window
    hi = F.col(end_col) + window
    iv = (
        intervals.withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    (F.col("_lo") / bin_size).cast("bigint"),
                    (F.col("_hi") / bin_size).cast("bigint"),
                )
            ),
        )
    )
    joined = p.join(
        iv,
        (p[chrom_col] == iv[chrom_col]) & (p["_bin"] == iv["_bin"]),
        "inner",
    ).where((F.col(pos_col) >= F.col("_lo")) & (F.col(pos_col) <= F.col("_hi")))
    return joined.drop(iv[chrom_col]).drop("_bin", "_lo", "_hi")
