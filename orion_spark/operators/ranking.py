"""Scalable global ranking / NTILE without a single-partition sort.

A global ``Window.orderBy(...)`` (no partitionBy) funnels the ENTIRE input
through one task — the canonical Spark scale-killer (WindowExec warns about
it). But exact global ranks do not need a global sort: if a bucket column
that is MONOTONE in the ordering can be derived from the row itself (floor
of the leading sort key, its negation for descending orders, ...), the rank
decomposes into

    rank(row) = (# rows in strictly-earlier buckets) + (rank within bucket)

— a tiny per-bucket count table (one row per bucket, cumulated with a
window over that dimension only and broadcast back) plus a per-bucket
window that all partitions compute in parallel. Same two-phase shape as
the prefix-sum in ``documents_sequence_packing``; this module generalizes
it to ranks and exact NTILE.

NTILE(k) semantics replicated exactly (SQL standard, Spark and DuckDB
agree): with n rows, q = n // k and rem = n % k, the first ``rem`` tiles
hold q+1 rows and the rest hold q, so the tile of global rank r (1-based)
is

    r <= rem*(q+1)  ->  ceil(r / (q+1))
    else            ->  rem + ceil((r - rem*(q+1)) / q)

Reference parity: ORION ranks/tiles only driver-side over collected pandas
frames (e.g. QC percentile summaries); this is the distributed equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_global_rank(
    df: DataFrame,
    bucket: Column,
    order_exprs: Sequence[Column],
    rank_col: str = "_rank",
    total_col: str | None = None,
) -> DataFrame:
    """Append the exact 1-based global rank under the total order
    ``order_exprs``, where ``bucket`` is any row-derivable expression
    monotone non-decreasing in that order (ties in ``bucket`` are broken
    by the within-bucket window, so coarse buckets only cost balance,
    never correctness). Optionally also appends the total row count as
    ``total_col`` (carried on the same broadcast join — no extra scalar
    cross-join). Two shuffles: the per-bucket count aggregate (tiny) and
    the per-bucket window; the cross-bucket prefix window runs over the
    bucket dimension table only, single-partition BY DESIGN."""
    b = df.withColumn("_bkt", bucket)
    # This window runs over the BUCKET dimension table only (one row per
    # bucket), so single-partition is bounded by design. The constant
    # partition key is written as the fold-proof `floor(_bkt) % 1` (a bare
    # lit() is constant-folded back to an empty partitionSpec, and `x * 0`
    # folds too when x is non-nullable): it keeps WindowExec's
    # single-partition scale warning meaningful for genuine offenders
    # while being semantically one partition. The floor matters — buckets
    # may be fractional doubles (e.g. a negated price for descending
    # orders), and a raw `_bkt % 1` would then be the fractional part,
    # silently fragmenting the offset table's partitioning.
    const = F.floor(F.col("_bkt").cast("double")) % 1
    wb = Window.partitionBy(const).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.partitionBy(const).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = (
        b.groupBy("_bkt")
        .agg(F.count("*").alias("_c"))
        .select(
            "_bkt",
            F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_off"),
            F.sum("_c").over(wt).alias("_tot"),
        )
    )
    ww = Window.partitionBy("_bkt").orderBy(*order_exprs)
    out = (
        b.join(F.broadcast(offs), "_bkt")
        .withColumn(rank_col, F.col("_off") + F.row_number().over(ww))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_tot"))
    return out.drop("_bkt", "_off", "_tot")


def scalable_ntile(
    df: DataFrame,
    n_tiles: int,
    bucket: Column,
    order_exprs: Sequence[Column],
    out_col: str,
) -> DataFrame:
    """Append ``out_col`` = NTILE(n_tiles) over the global total order
    ``order_exprs`` — bit-identical to ``F.ntile(n).over(Window.orderBy(
    ...))`` but without moving the dataset through one task. ``bucket``
    must be monotone in the order (see bucketed_global_rank); for a
    descending leading key pass its negation."""
    ranked = bucketed_global_rank(
        df, bucket, order_exprs, rank_col="_r", total_col="_n"
    )
    k = F.lit(n_tiles).cast("long")
    r, n = F.col("_r"), F.col("_n")
    q = F.floor(n / k)
    rem = n % k
    big = q + F.lit(1)
    cut = rem * big
    tile = (
        F.when(r <= cut, F.ceil(r / big))
        .otherwise(rem + F.ceil((r - cut) / q))
        .cast("int")
    )
    return ranked.withColumn(out_col, tile).drop("_r", "_n")
