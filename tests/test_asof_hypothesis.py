"""Property-based check of the as-of join: for random left/right tables,
the union+carry-forward implementation must agree with the obvious
per-row brute force (latest right.t <= left.t per key)."""

from hypothesis import given, settings, strategies as st

KEYS = ["k1", "k2"]

left_row = st.tuples(st.sampled_from(KEYS), st.integers(0, 30))
right_row = st.tuples(st.sampled_from(KEYS), st.integers(0, 30), st.integers(0, 999))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(left_row, min_size=1, max_size=12),
    st.lists(right_row, min_size=1, max_size=12, unique_by=lambda r: (r[0], r[1])),
)
def test_asof_matches_brute_force(left_rows, right_rows):
    from orion_spark.operators.asof import as_of_join
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-asof", shuffle_partitions=8)
    left = spark.createDataFrame(left_rows, "key string, t int")
    right = spark.createDataFrame(right_rows, "key string, t int, v int")

    got = {
        (r.key, r.t, i): r.v_asof
        for i, r in enumerate(
            as_of_join(
                left, right, ["key"], "t", ["v"], inner=False
            ).orderBy("key", "t").collect()
        )
    }

    # brute force: per left row, max-t right row with same key and t' <= t
    expected = []
    for k, t in sorted(left_rows):
        cands = [(rt, v) for rk, rt, v in right_rows if rk == k and rt <= t]
        expected.append((k, t, max(cands)[1] if cands else None))
    assert sorted(
        [(k, t, v) for (k, t, _i), v in got.items()]
    ) == sorted(expected)
