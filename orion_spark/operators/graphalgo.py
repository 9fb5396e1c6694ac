"""Iterative graph algorithms over the edge table (extension surface —
the reference computes adjacency/degree-style aggregates only; these add
the whole-graph iterative family a large-scale graph pipeline needs,
reusing the same nodes/edges data model).

Scale design: each iteration is one broadcast-or-shuffle join plus one
aggregate, and lineage is truncated per round with localCheckpoint —
without that, iteration k re-executes all k-1 predecessors (the classic
iterative-Spark trap, same treatment as llm/dedup.py:dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank (simplified: dangling mass is not
    redistributed, matching the plain SQL formulation so the DuckDB oracle
    can chain the identical recurrence):

        pr_0(v)   = 1/N
        pr_k+1(v) = (1-d)/N + d * sum_{(u,v) in E} pr_k(u) / outdeg(u)

    Returns (id, pr) for every node. Deterministic up to float summation
    order; callers round for cross-engine comparison.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    nodes = (
        e.select(F.col("_src").alias("id"))
        .unionByName(e.select(F.col("_dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("_src").agg(F.count("*").alias("_outdeg"))
    # (src, dst, outdeg) is loop-invariant: materialize once, reuse per round
    graph = e.join(deg, "_src").localCheckpoint(eager=True)

    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    base = F.lit((1.0 - damping) / n)
    for i in range(iterations):
        contrib = graph.join(pr, graph["_src"] == pr["id"]).select(
            F.col("_dst").alias("id"), (F.col("pr") / F.col("_outdeg")).alias("_c")
        )
        summed = contrib.groupBy("id").agg(F.sum("_c").alias("_s"))
        pr = nodes.join(summed, "id", "left").select(
            "id",
            (base + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))).alias("pr"),
        )
        # checkpoint periodically, not per round: a short fixed-iteration run
        # with one terminal action executes the whole DAG in a single pass,
        # and eager per-round materialization would only add overhead. Deep
        # loops still need truncation or the plan grows without bound.
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iterations:
            pr = pr.localCheckpoint(eager=True)
    return pr


def pagerank_oracle_sql(
    edges_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "subject",
    dst: str = "object",
    round_digits: int = 9,
) -> str:
    """DuckDB oracle: the identical recurrence unrolled as chained CTEs.
    `edges_cte` must define a CTE named `edges` with *src*/*dst* columns."""
    base = f"(1.0 - {damping})/(SELECT cnt FROM n)"
    chain = []
    for k in range(iterations):
        chain.append(f"""
    pr{k + 1} AS (
        SELECT nd.id,
               {base} + {damping} * COALESCE(SUM(p.pr / d.outdeg), 0) AS pr
        FROM nodes nd
        LEFT JOIN e ON e.dst = nd.id
        LEFT JOIN pr{k} p ON p.id = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY nd.id)""")
    return f"""
    WITH {edges_cte},
    e AS (SELECT {src} AS src, {dst} AS dst FROM edges),
    nodes AS (SELECT DISTINCT id FROM
              (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    n AS (SELECT COUNT(*) AS cnt FROM nodes),
    pr0 AS (SELECT id, 1.0/(SELECT cnt FROM n) AS pr FROM nodes),
    {",".join(chain)}
    SELECT id, round(pr, {round_digits}) AS pagerank
    FROM pr{iterations}
    """
