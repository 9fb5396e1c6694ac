"""As-of (temporal) join: match each left row to the most recent right row
at-or-before its timestamp, per key — the point-in-time lookup every event
pipeline needs (trade×quote, event×latest-state).

Spark lacks a native ASOF join. The scalable encoding is union + windowed
carry-forward: tag both sides, sort within each key by (time, side), and
`last(value, ignorenulls)` carries the right side's latest value onto each
left row. ONE shuffle (the window partition), no range self-join, no
per-row lookups — shuffle volume is |left| + |right|, which is optimal.

DuckDB has native ASOF JOIN, which serves as the oracle ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    partition_cols: list[str],
    time_col: str,
    value_cols: list[str],
    inner: bool = True,
) -> DataFrame:
    """For each left row: the latest right row with right.time <= left.time
    within the same partition key. Right side must be unique per
    (partition, time) — pre-aggregate if not (ties are undefined in any
    asof semantics). `inner=False` keeps unmatched left rows with nulls."""
    r = right.select(
        *partition_cols,
        F.col(time_col),
        *[F.col(c).alias(f"_asof_{c}") for c in value_cols],
        F.lit(0).alias("_side"),  # right sorts before left at equal time
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        *[F.lit(None).cast(r.schema[f"_asof_{c}"].dataType).alias(f"_asof_{c}")
          for c in value_cols],
        F.lit(1).alias("_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(time_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in u.columns if not c.startswith("_asof_") and c != "_side"],
        F.col("_side"),
        *[
            F.last(f"_asof_{c}", ignorenulls=True).over(w).alias(c + "_asof")
            for c in value_cols
        ],
    ).where(F.col("_side") == 1).drop("_side")
    out = carried.select(*l_cols, *[c + "_asof" for c in value_cols])
    if inner:
        cond = F.col(value_cols[0] + "_asof").isNotNull()
        out = out.where(cond)
    return out
