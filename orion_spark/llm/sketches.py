"""Count-Min sketch: fixed-size approximate frequency table for corpus
vocabulary at scale.

At 100 TB the exact word-frequency table IS the scale problem (vocabulary
grows with the corpus; the groupBy output is unbounded). A Count-Min
sketch caps it: d x w counters (d hash rows, w buckets) built by ONE
partial-aggregatable groupBy over (row, bucket) — the aggregate output is
at most d*w rows regardless of corpus size, mergeable across shards by
plain addition, and any term's frequency is estimated as the minimum of
its d counters with one-sided error (estimate >= truth;
overestimate <= eps*N with eps = e/w at confidence 1 - e^-d).

Unlike the HLL panels (engine-specific sketch bytes, rows-only checks),
Count-Min is plain integer arithmetic over the shared md5-prefix hash
family — deterministic, so the sketch AND its estimates get full
value-hash DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orion_spark.llm.dedup import MINHASH_P, _hash_params

CM_DEPTH = 4
CM_WIDTH = 1024


def _base_hash(key: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % MINHASH_P
    )


def _buckets(key: Column, depth: int, width: int) -> Column:
    """Array of `depth` bucket indices for a key (row i uses family hash i)."""
    x = _base_hash(key)
    return F.array(
        *[
            ((F.lit(a) * x + F.lit(b)) % MINHASH_P) % width
            for a, b in _hash_params(depth)
        ]
    )


def _corpus_words(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("word")
    )


def cm_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(row int, bucket int, cnt bigint): the sketch counters. One explode
    (depth entries per word occurrence) + one groupBy bounded at depth*width
    groups — map-side partials collapse almost everything."""
    words = _corpus_words(df, text_col)
    return (
        words.select(
            F.posexplode(_buckets(F.col("word"), depth, width)).alias(
                "row", "bucket"
            )
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Counters add: union + re-aggregate. Shard-parallel builds and
    incremental maintenance both reduce to this."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    word_col: str = "word",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """probes + cm_estimate column: min over the word's d counters. The
    sketch is bounded (<= depth*width rows) so it broadcasts; the probe
    side takes one explode + one groupBy on its own key."""
    exploded = probes.select(
        word_col,
        F.posexplode(_buckets(F.col(word_col), depth, width)).alias(
            "row", "bucket"
        ),
    )
    return (
        exploded.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(word_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_estimate"))
    )


def cm_topk_accuracy(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(word, true_count, cm_estimate) for the corpus's true top-k words
    (count desc, word asc — a total order): the one-sided-error report.
    Exercises build + estimate in one plan; true counts come from the
    exact aggregate for comparison."""
    words = _corpus_words(df, text_col)
    true_counts = words.groupBy("word").agg(F.count("*").alias("true_count"))
    top = true_counts.orderBy(F.desc("true_count"), F.asc("word")).limit(k)
    sketch = cm_build(df, text_col, depth, width)
    est = cm_estimate(sketch, top.select("word"), "word", depth, width)
    return (
        top.join(est, "word")
        .select("word", "true_count", "cm_estimate")
    )


def cm_topk_accuracy_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = 20,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> str:
    """DuckDB reproduction from the same hash constants."""
    base = f"(('0x' || substr(md5(word), 1, 8))::BIGINT % {MINHASH_P})"
    bucket_list = "[" + ", ".join(
        f"(({a} * {base} + {b}) % {MINHASH_P}) % {width}"
        for a, b in _hash_params(depth)
    ) + "]"
    return f"""
    WITH words AS (
        SELECT x AS word
        FROM (SELECT unnest(string_split_regex(lower(trim({text_col})), '\\s+')) AS x
              FROM {table})
        WHERE x <> ''),
    sketch AS (
        SELECT row, bucket, COUNT(*) AS cnt
        FROM (SELECT unnest(range(0, {depth})) AS row,
                     unnest({bucket_list}) AS bucket
              FROM words)
        GROUP BY row, bucket),
    top AS (
        SELECT word, COUNT(*) AS true_count
        FROM words GROUP BY word
        ORDER BY true_count DESC, word ASC LIMIT {k}),
    probe AS (
        SELECT word, unnest(range(0, {depth})) AS row,
               unnest({bucket_list}) AS bucket
        FROM top)
    SELECT t.word, t.true_count,
           (SELECT MIN(coalesce(s.cnt, 0))
            FROM probe p LEFT JOIN sketch s
              ON p.row = s.row AND p.bucket = s.bucket
            WHERE p.word = t.word) AS cm_estimate
    FROM top t
    """
