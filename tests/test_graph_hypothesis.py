"""Property-based checks for the pair-graph operators: random graphs /
interval sets, Spark result vs an obvious pure-Python brute force."""

from hypothesis import given, settings, strategies as st

edge = st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1])


def _norm_edges(raw):
    return sorted({(min(a, b), max(a, b)) for a, b in raw})


def _brute_kcore(pairs, k, rounds):
    edges = set(pairs)
    for _ in range(rounds):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


@settings(max_examples=8, deadline=None)
@given(st.lists(edge, min_size=1, max_size=25), st.integers(2, 3), st.integers(1, 3))
def test_kcore_matches_brute_force(raw_edges, k, rounds):
    from orion_spark.operators.graphalgo import kcore_prune
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-graph", shuffle_partitions=8)
    pairs = _norm_edges(raw_edges)
    df = spark.createDataFrame(pairs, "a int, b int")
    got = {r.node: r.degree for r in kcore_prune(df, k=k, rounds=rounds).collect()}
    assert got == _brute_kcore(pairs, k, rounds)


interval = st.tuples(
    st.sampled_from(["P", "Q"]),
    st.integers(0, 199),
    st.integers(0, 60),
    st.integers(1, 45),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(interval, min_size=1, max_size=30), st.sampled_from([7, 16, 100]))
def test_interval_self_overlap_matches_brute_force(raw, bin_size):
    from orion_spark.operators.range_join import interval_self_overlap
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-graph", shuffle_partitions=8)
    rows = [
        (blk, i, float(s), float(s + ln))
        for i, (blk, _, s, ln) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "block string, id int, s double, e double")
    got = sorted(
        (r.block, r.id_a, r.id_b)
        for r in interval_self_overlap(df, bin_size=bin_size).collect()
    )
    want = sorted(
        (ba, ia, ib)
        for (ba, ia, sa, ea) in rows
        for (bb, ib, sb, eb) in rows
        if ba == bb and ia < ib and sa < eb and sb < ea
    )
    assert got == want
