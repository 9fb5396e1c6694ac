"""Property-based checks of the bin-bucketed interval joins: for random
intervals, the owner-bin dedup scheme must agree with the obvious
brute-force overlap enumeration for every bin size (the operator's
correctness must not depend on tuning)."""

from hypothesis import given, settings, strategies as st

CHROMS = ["cA", "cB"]

iv = st.tuples(
    st.sampled_from(CHROMS), st.integers(0, 120), st.integers(0, 40)
)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(iv, min_size=1, max_size=10),
    st.lists(iv, min_size=1, max_size=10),
    st.sampled_from([1, 7, 16, 1000]),
)
def test_interval_overlap_join_matches_brute_force(lrows, rrows, bin_size):
    from orion_spark.operators.range_join import interval_overlap_join
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-rangejoin", shuffle_partitions=8)
    left = spark.createDataFrame(
        [(f"L{i}", c, s, s + ln) for i, (c, s, ln) in enumerate(lrows)],
        "lid string, chrom string, start long, end long",
    )
    right = spark.createDataFrame(
        [(f"R{i}", c, s, s + ln) for i, (c, s, ln) in enumerate(rrows)],
        "rid string, r_chrom string, r_start long, r_end long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(left, right, bin_size=bin_size).collect()
    )
    expected = sorted(
        (f"L{i}", f"R{j}")
        for i, (lc, ls, lln) in enumerate(lrows)
        for j, (rc, rs, rln) in enumerate(rrows)
        if lc == rc and ls <= rs + rln and rs <= ls + lln
    )
    assert got == expected
