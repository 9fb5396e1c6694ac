"""Property-based determinism test (hypothesis): the property-merge
aggregate must produce identical results for any row order / partitioning
of the same multiset of rows — the SURVEY §7.4.1 correctness trap."""

import random

from hypothesis import given, settings, strategies as st

from orion_spark.operators.merge import merge_properties_agg

IDS = ["A", "B", "C"]
NAMES = ["", "x", "y", None]
SCORES = [0.0, 1.5, None, 2.5]
PUBS = [None, ["P:1"], ["P:2", "P:1"], ["P:3"]]

row_st = st.tuples(
    st.sampled_from(IDS),
    st.sampled_from(NAMES),
    st.sampled_from(SCORES),
    st.sampled_from(PUBS),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=14), st.randoms())
def test_merge_is_order_and_partition_invariant(spark_rows, rng):
    # hypothesis runs inside one spark session; build it lazily
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-merge", shuffle_partitions=8)
    rows = [
        (rid, name, score, pubs, ordinal)
        for ordinal, (rid, name, score, pubs) in enumerate(spark_rows)
    ]
    schema = (
        "id string, name string, score double, publications array<string>, "
        "_source_ordinal int"
    )

    def run(rows_in, n_parts):
        df = spark.createDataFrame(rows_in, schema).repartition(n_parts)
        out = merge_properties_agg(df, ["id"]).collect()
        return sorted(
            (r.id, r.name, r.score, tuple(r.publications or [])) for r in out
        )

    shuffled = rows[:]
    rng.shuffle(shuffled)
    assert run(rows, 1) == run(shuffled, 7)
