"""Differential fuzzing for the round-5 operator families:

1. ngram_lm_score vs a ~30-line pure-Python add-k bigram LM — the Spark
   plan (posexplode + lag window + three joins) must reproduce the
   textbook arithmetic on arbitrary corpora, including OOV tokens,
   single-token documents, and train/score vocabulary mismatch.
2. incremental QC partials vs a full recompute — after any sequence of
   sharded upserts, folding the per-shard partials must equal QC
   aggregates computed directly on the merged bundle (the algebraic
   decomposition has no drift).

Same discipline as test_merge_properties_hypothesis.py: small randomized
inputs, exact expected values computed in plain Python.
"""

import math
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

VOCAB = ["a", "b", "c", "dd", "e"]

doc_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6).map(" ".join)


def _py_lm_bits(train_docs: list[str], score_docs: list[str], k: float):
    """Reference implementation: add-k bigram LM bits-per-token."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    for d in train_docs:
        toks = d.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n_total = sum(uni.values())
    v_size = len(uni)
    out = {}
    for i, d in enumerate(score_docs):
        toks = d.lower().split()
        lps = []
        for j, w in enumerate(toks):
            if j == 0:
                lps.append(math.log2((uni[w] + k) / (n_total + k * v_size)))
            else:
                prev = toks[j - 1]
                lps.append(
                    math.log2((bi[(prev, w)] + k) / (uni[prev] + k * v_size))
                )
        out[i] = (len(toks), -sum(lps) / len(toks))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(doc_st, min_size=1, max_size=5),
    st.lists(doc_st, min_size=1, max_size=4),
    st.sampled_from([0.25, 0.5, 1.0]),
)
def test_ngram_lm_score_matches_python_reference(train_docs, score_docs, k):
    from orion_spark.llm.textstats import ngram_lm_score
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-lm", shuffle_partitions=8)
    train = spark.createDataFrame(
        [(f"t{i}", d) for i, d in enumerate(train_docs)],
        "doc_id string, text string",
    )
    score = spark.createDataFrame(
        [(f"s{i}", d) for i, d in enumerate(score_docs)],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.bits_per_token)
        for r in ngram_lm_score(train, score, k=k).collect()
    }
    want = _py_lm_bits(train_docs, score_docs, k)
    assert set(got) == {f"s{i}" for i in want}
    for i, (n, bits) in want.items():
        gn, gb = got[f"s{i}"]
        assert gn == n
        assert abs(gb - bits) < 1e-9, (score_docs[i], gb, bits)


SUBJECTS = [f"S:{i}" for i in range(12)]
PREDS = ["p1", "p2"]
PUB_SETS = [None, ["PMID:1"], ["PMID:2", "PMID:3"]]

edge_st = st.tuples(
    st.sampled_from(SUBJECTS),
    st.sampled_from(PREDS),
    st.sampled_from(PUB_SETS),
)


def _expected_qc(merged_rows):
    """Full-recompute reference over collected merged edges."""
    exp: Counter = Counter()
    for r in merged_rows:
        exp[("predicate", r.predicate)] += 1
        exp[("primary_knowledge_source", r.primary_knowledge_source)] += 1
        exp[("subject_prefix", r.subject.split(":")[0])] += 1
        exp[("publications_per_predicate", r.predicate)] += len(
            r.publications or []
        )
    return exp


@settings(max_examples=6, deadline=None)
@given(
    st.lists(edge_st, min_size=1, max_size=10),
    st.lists(st.lists(edge_st, min_size=1, max_size=5), min_size=1, max_size=2),
)
def test_qc_partials_match_full_recompute_after_upserts(tmp_path_factory, base, deltas):
    from pyspark.sql import Row

    from orion_spark.operators.merge import merge_edges
    from orion_spark.session import get_spark
    from orion_spark.sinks import incremental as INC
    from orion_spark.sinks import qc_incremental as QCI

    spark = get_spark(app_name="hypothesis-qc", shuffle_partitions=8)
    path = str(tmp_path_factory.mktemp("qcfuzz") / "bundle")

    def frame(rows):
        return spark.createDataFrame(
            [
                Row(subject=s, predicate=p, object="O:1",
                    primary_knowledge_source="infores:x",
                    publications=pubs, _source_ordinal=i)
                for i, (s, p, pubs) in enumerate(rows)
            ],
            "subject string, predicate string, object string, "
            "primary_knowledge_source string, publications array<string>, "
            "_source_ordinal long",
        )

    INC.write_sharded_bundle(merge_edges(frame(base)), path, ["subject"], n_shards=4)
    QCI.write_qc_partials(spark, path, "edges")
    for delta in deltas:
        touched = INC.upsert_sharded_edges(spark, frame(delta), path, n_shards=4)
        QCI.refresh_qc_partials(spark, path, touched, "edges")

    got = {
        (r.metric, r.key): r.n for r in QCI.qc_totals(spark, path).collect()
    }
    # drop zero-valued sum rows (publications metric can legitimately be 0)
    got = {k: v for k, v in got.items() if not (v == 0 and k[0] == "publications_per_predicate")}
    merged = INC.read_sharded_bundle(spark, path).collect()
    want = {
        k: v
        for k, v in _expected_qc(merged).items()
        if not (v == 0 and k[0] == "publications_per_predicate")
    }
    assert got == want
    assert QCI.verify_partials(spark, path) == []


@settings(max_examples=6, deadline=None)
@given(
    st.integers(min_value=8, max_value=14),   # base size (>= n_clusters)
    st.integers(min_value=1, max_value=8),    # delta size
    st.integers(min_value=2, max_value=4),    # n_probe
    st.randoms(use_true_random=False),
)
def test_ivf_index_add_equals_rebuild_randomized(tmp_path_factory, n_base, n_delta, n_probe, rng):
    """Persisted build+add+search == in-memory fixed-centroid IVF over
    the union, for random vector sets — whenever delta ids sort above
    the seed ids (the documented frozen-quantizer contract)."""
    from orion_spark.llm import similarity as S
    from orion_spark.session import get_spark

    spark = get_spark(app_name="hypothesis-ivf", shuffle_partitions=8)
    n_clusters = 8
    dim = 4

    def vec():
        return [round(rng.uniform(-1, 1), 3) or 0.1 for _ in range(dim)]

    base_rows = [(i, vec()) for i in range(n_base)]
    delta_rows = [(n_base + i, vec()) for i in range(n_delta)]
    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(base_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    full = spark.createDataFrame(base_rows + delta_rows, schema)
    queries = full.where(F.col("vec_id") % 3 == 0)

    path = str(tmp_path_factory.mktemp("ivffuzz") / "idx")
    S.build_ivf_index(spark, base, path, n_clusters=n_clusters)
    S.upsert_ivf_index(spark, delta, path)
    got = sorted(
        (r.query_id, r.rk, r.neighbor_id, r.cosine)
        for r in S.search_ivf_index(
            spark, queries, path, k=5, n_probe=n_probe
        ).collect()
    )
    want = sorted(
        (r.query_id, r.rk, r.neighbor_id, r.cosine)
        for r in S.ivf_topk_fixed_centroids(
            queries, full, k=5, n_clusters=n_clusters, n_probe=n_probe
        ).collect()
    )
    assert got == want
