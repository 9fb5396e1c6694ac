"""BM25 full-text retrieval over the documents table.

The classic Okapi BM25 ranking function (Robertson & Zaragoza 2009), the
baseline every retrieval-augmented training-data pipeline reaches for
when it needs lexical search next to the embedding ANN path
(llm/similarity.py). Implemented as pure DataFrame aggregates:

  score(d, Q) = sum_{t in Q} idf(t) * tf(t,d)*(k1+1)
                              / (tf(t,d) + k1*(1 - b + b*dl(d)/avgdl))
  idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Determinism contract (so the DuckDB oracle hash-matches): the per-doc
sum folds term contributions in sorted-term order on BOTH engines
(Spark: fold over array_sort(collect_list(struct(term, contrib)));
DuckDB: list_sum(list(contrib ORDER BY term)) — list_sum is an in-order
fold), and only the final score is rounded. Query terms are themselves
derived deterministically: the top-m corpus terms by document frequency
(ties broken by term ascending) after stopword removal — a
self-contained "hot query" so the operator needs no external input.

Scale shape: term frequencies are one (doc, term) hash aggregate with
map-side combine; document frequency is a second aggregate over that
(already-distinct) output; N/avgdl is a 1-row broadcast; the query-term
dim (m rows) broadcasts into the tf table. One corpus-keyed shuffle
total — the same class as the TF-IDF operator (textstats.tfidf_top_terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orion_spark.llm.textstats import STOPWORDS

K1 = 1.2
B = 0.75


def _doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term") != "")
    )


def bm25_topk(
    df: DataFrame,
    n_query_terms: int = 5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 against the corpus' m hottest
    non-stopword terms. Output: (doc_id, score, rk)."""
    terms = _doc_terms(df, text_col, id_col)
    # one corpus scan + one token shuffle: tf is materialized once
    # (localCheckpoint severs lineage without pinning the session — the
    # registry pattern) and every downstream statistic derives from it,
    # instead of re-scanning/re-shuffling the token table per consumer
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    qterms = (
        dfreq.where(~F.col("term").isin(list(STOPWORDS)))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(n_query_terms)
    )

    contrib = (
        tf.join(F.broadcast(qterms.select("term", "df")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (
                        F.lit(1.0 - B)
                        + F.lit(B) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ),
            6,
        ).alias("score")
    )
    from pyspark.sql import Window

    # TakeOrderedAndProject for the global top-k (no single-partition
    # window over the full corpus); the rank column is assigned on the
    # already-reduced k rows.
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id", "score", "rk"
    )


def bm25_topk_oracle_sql(
    n_query_terms: int = 5,
    k: int = 20,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    stop = ", ".join(f"'{s}'" for s in sorted(STOPWORDS))
    return f"""
    WITH terms AS (
        SELECT {id_col} AS doc_id, unnest(
            string_split_regex(lower(trim({text_col})), '\\s+')) AS term
        FROM {table}),
    tok AS (SELECT * FROM terms WHERE term <> ''),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qterms AS (
        SELECT term, df FROM dfreq
        WHERE term NOT IN ({stop})
        ORDER BY df DESC, term ASC LIMIT {n_query_terms}),
    contrib AS (
        SELECT tf.doc_id, tf.term,
               ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (tf.tf * {K1 + 1.0})
               / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.dl / s.avgdl)) AS c
        FROM tf
        JOIN qterms q ON tf.term = q.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats s),
    scored AS (
        SELECT doc_id,
               ROUND(list_sum(list(c ORDER BY term)), 6) AS score
        FROM contrib GROUP BY doc_id),
    ranked AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
        FROM scored)
    SELECT doc_id, score, rk FROM ranked WHERE rk <= {k}
    """
