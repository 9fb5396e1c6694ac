"""AnswerCoalesce file sink (SURVEY §2.1 K6, §2.3 A7/A8).

Reference (orion/answercoalesce_build.py:57-165) emits six text files from
one pass over the graph; here each is a small DataFrame plan over the
bundle, written distributed. The CAID/blocklist anti-join (J7) is a
broadcast filter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from orion_spark.operators.analyze import adjacency, backlinks, node_category_counts


def apply_blocklist(
    nodes: DataFrame, blocklist: DataFrame | None = None, id_col: str = "id"
) -> DataFrame:
    """J7: drop blocklisted ids and the CAID: prefix
    (orion/answercoalesce_build.py:88-124)."""
    out = nodes.where(~F.col(id_col).startswith("CAID:"))
    if blocklist is not None:
        out = out.join(
            broadcast(blocklist.select(F.col("id").alias(id_col))), id_col, "left_anti"
        )
    return out


def ac_tables(
    nodes: DataFrame, edges: DataFrame, blocklist: DataFrame | None = None
) -> dict[str, DataFrame]:
    """The six AC outputs as DataFrames keyed by file stem."""
    kept = apply_blocklist(nodes, blocklist)
    kept_edges = edges.join(
        kept.select(F.col("id").alias("subject")), "subject", "left_semi"
    ).join(kept.select(F.col("id").alias("object")), "object", "left_semi")
    return {
        "nodelabels": kept.select("id", F.explode("category").alias("label")),
        "nodenames": kept.select("id", "name"),
        "category_count": node_category_counts(kept),
        "prov": kept_edges.groupBy("predicate", "primary_knowledge_source").count(),
        "links": adjacency(kept_edges),
        "backlinks": backlinks(kept_edges, kept),
    }


def write_ac_files(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    blocklist: DataFrame | None = None,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for stem, df in ac_tables(nodes, edges, blocklist).items():
        out = df
        # links carries an array<struct> column; serialize for text output
        for f in df.schema.fields:
            if not f.dataType.typeName() in ("string", "long", "integer", "double"):
                out = out.withColumn(f.name, F.to_json(F.col(f.name)))
        out.write.mode("overwrite").option("sep", "\t").csv(
            os.path.join(out_dir, stem)
        )
