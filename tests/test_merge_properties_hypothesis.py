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


# ---------------------------------------------------------------------------
# Differential fuzz of the nested `sources` tail (round-4 verdict note #1):
# merge_retrieval_sources vs an INDEPENDENT Python oracle of the
# reference's grouped recursive merge (orion/merging.py:49-59 key fn,
# 117-183 entity_merging_function folded over a concatenated list).
# Two documented divergences, normalized in the comparison:
#  - keys are (resource_id, resource_role) PAIRS (the reference's string
#    concatenation collides ("a","bc") with ("ab","c"); the oracle uses
#    the pair key, matching the safer repo semantics);
#  - upstream lists of NEVER-MERGED items are canonicalized (sorted,
#    deduped) by the repo but left untouched by the reference; upstream
#    id order/multiplicity carry no meaning (the reference itself
#    sorted-set-normalizes on any merge), so the oracle canonicalizes
#    too and the None/non-None distinction is compared STRICTLY.
# ---------------------------------------------------------------------------

RES_IDS = [None, "a", "ab", "b"]
ROLES = [None, "", "c", "bc", "primary"]
UPSTREAMS = [None, [], ["u1"], ["u2", "u1"], ["u1", "u1", "u3"]]

source_st = st.tuples(
    st.sampled_from(RES_IDS), st.sampled_from(ROLES), st.sampled_from(UPSTREAMS)
)


def _oracle_merge_sources(items):
    """Reference semantics, independently re-derived from
    orion/merging.py:160-183: group by key in first-occurrence order;
    within a group fold upstream lists pairwise — None contributes
    nothing, the first non-None list replaces None, two lists union —
    normalizing to sorted(set()) at every touch. A group whose members
    are all None stays None."""
    grouped, order = {}, []
    for rid, role, ups in items:
        k = (rid, role)
        if k not in order:
            order.append(k)
            grouped[k] = None if ups is None else sorted(set(ups))
        else:
            cur = grouped[k]
            if ups is None:
                pass
            elif cur is None:
                grouped[k] = sorted(set(ups))
            else:
                grouped[k] = sorted(set(cur) | set(ups))
    return [(k[0], k[1], grouped[k]) for k in order]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(source_st, max_size=8), min_size=1, max_size=12))
def test_merge_retrieval_sources_differential(source_lists):
    from pyspark.sql import Row, functions as F

    from orion_spark.operators.merge import merge_retrieval_sources
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-merge", shuffle_partitions=8)
    schema = (
        "row_id int, sources array<struct<resource_id:string,"
        "resource_role:string,upstream_resource_ids:array<string>>>"
    )
    rows = [
        Row(row_id=i, sources=[
            {"resource_id": rid, "resource_role": role,
             "upstream_resource_ids": ups}
            for rid, role, ups in lst
        ])
        for i, lst in enumerate(source_lists)
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        r.row_id: [
            (s.resource_id, s.resource_role,
             None if s.upstream_resource_ids is None
             else list(s.upstream_resource_ids))
            for s in (r.s or [])
        ]
        for r in df.select(
            "row_id", merge_retrieval_sources(F.col("sources")).alias("s")
        ).collect()
    }
    for i, lst in enumerate(source_lists):
        assert got[i] == _oracle_merge_sources(lst), f"row {i}: {lst}"


# ---------------------------------------------------------------------------
# Differential fuzz of the MAP-tail per-key merge (round-5): merge_nodes
# over a map<string,string> property vs an independent Python oracle of
# the reference's dict merge (orion/merging.py:117-133), plus order/
# partition invariance. Map values are non-null by contract
# (model.fold_property_tail filters nulls): for non-null values of one
# type, the reference's "falsy replaced by any later value" collapses to
# "falsy upgraded by first truthy" because all falsy non-null strings
# are '' — the oracle implements exactly that.
# ---------------------------------------------------------------------------

MAP_KEYS = ["k1", "k2", "k3"]
MAP_VALS = ["", "a", "b"]

map_st = st.one_of(
    st.none(),
    st.dictionaries(st.sampled_from(MAP_KEYS), st.sampled_from(MAP_VALS),
                    max_size=3),
)
maprow_st = st.tuples(st.sampled_from(["A", "B"]), map_st)


def _oracle_map_merge(maps_in_ordinal_order):
    entries = [m for m in maps_in_ordinal_order if m is not None]
    if not entries:
        return None
    acc = {}
    for m in entries:
        for k, v in m.items():
            if k not in acc:
                acc[k] = v
            elif acc[k] == "" and v != "":
                acc[k] = v
    return acc


@settings(max_examples=20, deadline=None)
@given(st.lists(maprow_st, min_size=1, max_size=12), st.randoms())
def test_map_merge_differential_and_invariant(rows_in, rng):
    from orion_spark.operators.merge import merge_nodes
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-merge", shuffle_partitions=8)
    rows = [(rid, i, m) for i, (rid, m) in enumerate(rows_in)]
    schema = "id string, _source_ordinal int, properties map<string,string>"

    def run(rs, n_parts):
        df = spark.createDataFrame(rs, schema).repartition(n_parts)
        return {
            r.id: (dict(r.properties) if r.properties is not None else None)
            for r in merge_nodes(df).collect()
        }

    got = run(rows, 1)
    for rid in {r[0] for r in rows}:
        expect = _oracle_map_merge(
            [m for (i, m) in sorted((r[1], r[2]) for r in rows if r[0] == rid)]
        )
        assert got[rid] == expect, f"{rid}: {got[rid]} != {expect}"

    shuffled = rows[:]
    rng.shuffle(shuffled)
    assert run(shuffled, 7) == got
