"""In-engine ridge quality classifier: exact numpy differential on the
closed-form solve, class separation on a constructed corpus, empty-doc
robustness, and the DuckDB oracle differential."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from orion_spark.llm import classifier as C

P = 2_147_483_647


def _np_feats(text: str, d: int = C.D_BUCKETS) -> np.ndarray:
    ws = [w for w in text.lower().strip().split() if w]
    b = [(int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % P) % d for w in ws]
    n = len(b)
    f = [(sum(1 for x in b if x == i) / n if n else 0.0) for i in range(d)]
    return np.array(f + [1.0])


def _corpus(spark, texts, labels):
    return spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(zip(texts, labels))],
        ["doc_id", "text", "y"],
    )


def test_ridge_weights_match_numpy_exactly(spark):
    texts = [f"alpha beta {i} gamma {'delta ' * (i % 4)}" for i in range(30)]
    labels = [float(i % 3 == 0) for i in range(30)]
    df = _corpus(spark, texts, labels)
    got = C.ridge_weights_frame(df, F.col("y")).collect()[0]
    X = np.array([_np_feats(t) for t in texts])
    y = np.array(labels)
    w = np.linalg.solve(X.T @ X + np.eye(C.D_BUCKETS + 1), X.T @ y)
    for i in range(C.D_BUCKETS + 1):
        assert got[f"w_{i}"] == pytest.approx(w[i], abs=1e-9)


def test_scores_separate_classes(spark):
    # class 1 repeats a marker token, class 0 uses disjoint filler
    texts = [f"quality marker token {'good ' * 8} {i}" for i in range(20)] + [
        f"zz{i} junk filler {'xx ' * 8}" for i in range(20)
    ]
    labels = [1.0] * 20 + [0.0] * 20
    df = _corpus(spark, texts, labels)
    out = C.ridge_quality_scores(df, F.col("y")).collect()
    pos = [r.score for r in out if r.label == 1.0]
    neg = [r.score for r in out if r.label == 0.0]
    assert min(pos) > max(neg)


def test_empty_docs_are_harmless(spark):
    df = _corpus(spark, ["the good text here", "", "   "], [1.0, 0.0, 0.0])
    out = {r.doc_id: r.score for r in C.ridge_quality_scores(df, F.col("y")).collect()}
    assert len(out) == 3
    # empty docs share identical (bias-only) features -> identical scores
    assert out[1] == out[2]


def test_scores_match_duckdb_oracle(spark):
    import duckdb

    texts = [f"some words {i} {'en marker ' * (i % 3)}" for i in range(25)]
    langs = ["en" if i % 2 else "de" for i in range(25)]
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(zip(texts, langs))],
        ["doc_id", "text", "lang"],
    )
    got = sorted(
        (r.doc_id, r.label, r.score)
        for r in C.ridge_quality_scores(
            df, (F.col("lang") == "en").cast("double")
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    sql = C.ridge_scores_oracle_sql(
        "documents", "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END"
    )
    want = sorted((int(a), float(b), float(c)) for a, b, c in con.sql(sql).fetchall())
    assert got == want
