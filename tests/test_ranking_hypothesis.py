"""Property-based check of operators/ranking.py: for random value tables
and random tile counts, the two-phase scalable NTILE must be bit-identical
to pure-Python NTILE semantics (SQL standard: first n%k tiles get the
extra row over the total order), regardless of bucket coarseness — ties
inside a bucket, all rows in one bucket, negative and fractional values."""

from hypothesis import given, settings, strategies as st

row = st.tuples(
    st.integers(0, 200),            # id (unique-ified below)
    st.integers(-50, 50),           # value with heavy tie probability
)


def _python_ntile(rows, k):
    """Ground truth straight from the SQL-standard definition."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(ordered)
    q, rem = divmod(n, k)
    out, pos = {}, 0
    for tile in range(1, k + 1):
        size = q + 1 if tile <= rem else q
        for _ in range(size):
            if pos < n:
                out[ordered[pos][0]] = tile
                pos += 1
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(row, min_size=1, max_size=40, unique_by=lambda r: r[0]),
    st.integers(1, 7),
    st.sampled_from([1, 3, 1000]),  # bucket width: fine / medium / one-bucket
)
def test_scalable_ntile_matches_sql_standard(rows, k, width):
    from pyspark.sql import functions as F

    from orion_spark.operators.ranking import scalable_ntile
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-ranking", shuffle_partitions=8)
    df = spark.createDataFrame(
        [(i, float(v) + 0.25) for i, v in rows], "id int, v double"
    )
    got = {
        r.id: r.tile
        for r in scalable_ntile(
            df,
            k,
            F.floor(F.col("v") / width),
            [F.asc("v"), F.asc("id")],
            "tile",
        ).collect()
    }
    assert got == _python_ntile([(i, v + 0.25) for i, v in rows], k)
