"""Skew-aware aggregation (SURVEY §4 'Skew handling', §7.2 step 9).

At 100 TB a handful of hub nodes (biolink:NamedThing-scale ids) can own
millions of duplicate rows; a plain groupBy puts each hot key on ONE
reducer. AQE's skew splitting covers joins, but skewed *aggregations* need
salting: a two-phase aggregate that fans each hot key across `salt_buckets`
partial groups, then combines the partials.

The property-merge aggregate (A3) re-composes exactly:
- list props: concat+dedup+sort is associative and idempotent;
- keep-first-truthy scalars: phase 1 keeps (value, ordinal-of-value) pairs,
  phase 2 arg-mins over the carried ordinals — the globally-first truthy
  value survives no matter how rows were bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orion_spark.operators.merge import (
    SOURCE_ORDINAL,
    _is_retrieval_sources,
    _map_entries,
    _truthy,
    merge_entry_maps_agg,
    merge_retrieval_sources,
)


def _cmp_o(l, r):
    return F.when(l["o"] < r["o"], -1).when(l["o"] > r["o"], 1).otherwise(0)


def salted_counts(
    df: DataFrame, group_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase count: partial count per (key, salt), then sum per key.
    Identical result to groupBy().count(); bounded partition size."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*group_cols, "_salt").agg(F.count("*").alias("_pc"))
    return partial.groupBy(*group_cols).agg(F.sum("_pc").alias("n"))


def merge_properties_salted(
    df: DataFrame,
    group_cols: list[str],
    ordinal_col: str = SOURCE_ORDINAL,
    salt_buckets: int = 16,
) -> DataFrame:
    """A3 merge with bounded per-reducer group size; result is identical to
    `merge_properties_agg(df, group_cols)` under any bucketing."""
    if ordinal_col not in df.columns:
        df = df.withColumn(ordinal_col, F.lit(0))
    ordinal = F.col(ordinal_col)
    schema = {f.name: f.dataType for f in df.schema.fields}
    prop_cols = [c for c in df.columns if c not in group_cols and c != ordinal_col]

    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))

    p1_aggs, p2_aggs = [], []
    for c in prop_cols:
        dt = schema[c]
        col = F.col(c)
        if _is_retrieval_sources(c, dt):
            # phase 1 carries ordinal-TAGGED entries per salt; phase 2
            # re-sorts the union by ordinal and key-dedups once — same
            # output (content AND first-occurrence order) as the plain
            # aggregate's _merge_sources_expr
            tagged = F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                col.isNotNull(),
                                F.struct(ordinal.alias("o"), col.alias("a")),
                            )
                        ),
                        _cmp_o,
                    ),
                    lambda x: F.transform(
                        x["a"], lambda s: F.struct(x["o"].alias("o"), s.alias("s"))
                    ),
                )
            )
            # an empty tagged array can mean "all null" OR "non-null but
            # empty arrays" — carry an explicit non-null flag so the
            # all-null group stays NULL while [] inputs yield []
            p1_aggs += [
                tagged.alias(f"_s_{c}"),
                F.max(col.isNotNull().cast("int")).alias(f"_sn_{c}"),
            ]
            gathered = F.flatten(F.collect_list(F.col(f"_s_{c}")))
            resorted = F.array_sort(gathered, _cmp_o)
            p2_aggs.append(
                F.when(
                    F.max(F.col(f"_sn_{c}")) == 1,
                    merge_retrieval_sources(
                        F.transform(resorted, lambda x: x["s"])
                    ),
                ).alias(c)
            )
        elif isinstance(dt, T.ArrayType):
            merged = F.array_distinct(F.flatten(F.collect_list(col)))
            if not isinstance(dt.elementType, (T.StructType, T.MapType, T.ArrayType)):
                merged = F.array_sort(merged)
            p1_aggs.append(F.when(F.size(merged) > 0, merged).alias(c))
            remerged = F.array_distinct(F.flatten(F.collect_list(F.col(c))))
            if not isinstance(dt.elementType, (T.StructType, T.MapType, T.ArrayType)):
                remerged = F.array_sort(remerged)
            p2_aggs.append(F.when(F.size(remerged) > 0, remerged).alias(c))
        elif isinstance(dt, T.MapType):
            # per-key map merge: the entry-map argmin is associative
            # (merge.py:_map_entries), so phase 1 folds per salt and
            # phase 2 re-folds the partials — identical to the plain
            # aggregate under any bucketing
            entries = F.when(col.isNotNull(), _map_entries(col, ordinal, dt.valueType))
            p1_aggs.append(merge_entry_maps_agg(entries, dt).alias(f"_m_{c}"))
            p2_aggs.append(
                F.transform_values(
                    merge_entry_maps_agg(F.col(f"_m_{c}"), dt),
                    lambda k, s: s["v"],
                ).alias(c)
            )
        else:
            truthy_ord = F.when(_truthy(col, dt), ordinal)
            nonnull_ord = F.when(col.isNotNull(), ordinal)
            # phase 1 carries the winning value AND the ordinal it came from
            p1_aggs += [
                F.min_by(col, truthy_ord).alias(f"_t_{c}"),
                F.min(truthy_ord).alias(f"_to_{c}"),
                F.min_by(col, nonnull_ord).alias(f"_n_{c}"),
                F.min(nonnull_ord).alias(f"_no_{c}"),
            ]
            # phase 2 arg-mins over the carried ordinals
            p2_aggs.append(
                F.coalesce(
                    F.min_by(F.col(f"_t_{c}"), F.col(f"_to_{c}")),
                    F.min_by(F.col(f"_n_{c}"), F.col(f"_no_{c}")),
                ).alias(c)
            )

    phase1 = salted.groupBy(*group_cols, "_salt").agg(*p1_aggs)
    return phase1.groupBy(*group_cols).agg(*p2_aggs)
