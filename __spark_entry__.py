"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pipeline (KGX edge merge over the lineitem
graph) at sf0.001. `queries()` / `oracle_sql()` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle; the registry lives in
orion_spark/plans/queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the ORDER->PART KGX edge set from lineitem, run the
    property-merge aggregate (SURVEY §2.3 A3/A5), return merged edges."""
    from orion_spark.plans.queries import QUERIES

    return QUERIES["kgx_merge_edges"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from orion_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from orion_spark.plans.queries import ORACLES

    return dict(ORACLES)
