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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_size: int,
    chrom_col: str = "chrom",
    right_chrom_col: str = "r_chrom",
    left_bounds: tuple[str, str] = ("start", "end"),
    right_bounds: tuple[str, str] = ("r_start", "r_end"),
) -> DataFrame:
    """Inner-join intervals from two relations that overlap (CLOSED
    semantics: l.start <= r.end AND r.start <= l.end) within the same
    chromosome/block. Two-sided sibling of interval_self_overlap: both
    sides replicate to every bin they span, the join is an equi-join on
    (chrom, bin), and a pair survives only in its owner bin — the bin of
    the later start, which any overlapping pair's two intervals both
    cover — so each pair appears exactly once with no distinct.

    Replaces the reference's per-chromosome pandas masks for histone
    window→gene mapping (parsers/yeast/src/loadHistoneMap.py:319-335),
    which are O(windows × genes) per chromosome on the driver. The caller
    must pre-alias the right side's chrom/bounds columns to names that
    don't collide with the left's."""
    ls, le = left_bounds
    rs, re_ = right_bounds
    lb = left.withColumn(
        "_lbin",
        F.explode(
            F.sequence(
                F.floor(F.col(ls).cast("double") / bin_size),
                F.floor(F.col(le).cast("double") / bin_size),
            )
        ),
    )
    rb = right.withColumn(
        "_rbin",
        F.explode(
            F.sequence(
                F.floor(F.col(rs).cast("double") / bin_size),
                F.floor(F.col(re_).cast("double") / bin_size),
            )
        ),
    )
    owner = F.floor(F.greatest(F.col(ls), F.col(rs)).cast("double") / bin_size)
    return (
        lb.join(
            rb,
            (F.col(chrom_col) == F.col(right_chrom_col))
            & (F.col("_lbin") == F.col("_rbin")),
        )
        .where(
            (F.col("_lbin") == owner)
            & (F.col(ls) <= F.col(re_))
            & (F.col(rs) <= F.col(le))
        )
        .drop("_lbin", "_rbin")
    )


def interval_self_overlap(
    intervals: DataFrame,
    bin_size: int,
    block_col: str = "block",
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """All strictly-overlapping interval pairs within each block
    (half-open semantics: a overlaps b iff a.s < b.e AND b.s < a.e).

    Same bin-bucketing strategy as point_interval_join, extended to
    interval×interval: each interval is replicated to every bin it spans,
    the pair join is an equi-join on (block, bin), and each candidate pair
    is kept only in its OWNER bin — the bin of the later start,
    floor(greatest(s_a, s_b) / bin_size) — so every overlapping pair
    survives exactly once with no post-join distinct. A plain non-equi
    self-join would be a per-block nested loop (O(n²) comparisons and a
    single-task BroadcastNestedLoopJoin plan); this stays a hash join
    whose collision sets are bounded by bin occupancy.

    Returns columns: block, id_a, id_b, s_a, e_a, s_b, e_b.
    """
    binned = intervals.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    ).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("s").cast("double") / bin_size),
                F.floor(F.col("e").cast("double") / bin_size),
            )
        ),
    )
    a = binned.select(
        "block", "_bin",
        F.col("id").alias("id_a"), F.col("s").alias("s_a"), F.col("e").alias("e_a"),
    )
    b = binned.select(
        F.col("block").alias("_blk_b"), F.col("_bin").alias("_bin_b"),
        F.col("id").alias("id_b"), F.col("s").alias("s_b"), F.col("e").alias("e_b"),
    )
    owner_bin = F.floor(F.greatest("s_a", "s_b").cast("double") / bin_size)
    return (
        a.join(
            b,
            (a["block"] == b["_blk_b"])
            & (a["_bin"] == b["_bin_b"])
            & (a["id_a"] < b["id_b"]),
        )
        .where(
            (F.col("_bin") == owner_bin)
            & (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
        )
        .select("block", "id_a", "id_b", "s_a", "e_a", "s_b", "e_b")
    )
