"""Property tests for the second-pass round-7 curation operators.

- winnowing: the paper's coverage guarantee — any two documents sharing
  a token run of length >= w + k - 1 share at least one selected
  fingerprint — must hold for arbitrary corpora, not just the hand case.
- span rewrite: token conservation (kept + removed == total) and the
  first-occurrence contract (the corpus-wide earliest occurrence of any
  duplicated window survives verbatim).
"""

from hypothesis import given, settings, strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _doc(rng_words):
    return " ".join(rng_words)


@settings(max_examples=8, deadline=None)
@given(
    shared=st.lists(st.sampled_from(WORDS), min_size=6, max_size=9),
    pre=st.lists(st.sampled_from(WORDS), min_size=0, max_size=5),
    post=st.lists(st.sampled_from(WORDS), min_size=0, max_size=5),
)
def test_winnowing_guarantee_random_corpora(spark, shared, pre, post):
    from orion_spark.llm.dedup import winnowing_fingerprints

    # k=3, w=4 -> any shared run of >= 6 tokens must collide
    docs = spark.createDataFrame(
        [
            (1, _doc(pre + shared + ["tailone"])),
            (2, _doc(["headtwo"] + shared + post)),
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc.get(1, set()) & by_doc.get(2, set())


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
        min_size=2,
        max_size=6,
    )
)
def test_span_rewrite_token_conservation(spark, docs):
    from orion_spark.llm.dedup import duplicate_span_rewrite

    frame = spark.createDataFrame(
        [(i, _doc(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    out = duplicate_span_rewrite(frame, n=3).collect()
    assert len(out) == len(docs)
    for r in out:
        kept = len(r.new_text.split()) if r.new_text else 0
        assert kept + r.n_removed == r.n_tokens
        assert 0 <= r.n_removed <= r.n_tokens


@settings(max_examples=6, deadline=None)
@given(
    # unique words -> no within-document repeated window, so doc 0 must
    # survive verbatim (self-repeats are legitimately removed otherwise)
    body=st.lists(st.sampled_from(WORDS), min_size=3, max_size=6, unique=True),
    n_copies=st.integers(min_value=2, max_value=4),
)
def test_span_rewrite_first_occurrence_survives(spark, body, n_copies):
    """Clone one document n times: the lowest doc_id keeps its text
    verbatim (it is the globally-first occurrence of every window) and
    every full clone rewrites to empty when the doc is all one span."""
    from orion_spark.llm.dedup import duplicate_span_rewrite

    text = _doc(body)
    frame = spark.createDataFrame(
        [(i, text) for i in range(n_copies)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in duplicate_span_rewrite(frame, n=3).collect()}
    assert out[0].new_text == text.lower()
    assert out[0].n_removed == 0
    for i in range(1, n_copies):
        assert out[i].n_removed == out[i].n_tokens
        assert out[i].new_text == ""
