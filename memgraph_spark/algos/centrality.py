"""Degree centrality + node similarity.

Parity: src/mage/cpp/degree_centrality_module and the node_similarity module
(Jaccard over neighbor sets). Both are single-shuffle DataFrame aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_centrality(
    edges: DataFrame,
    direction: str = "both",
    src_col: str = "src",
    dst_col: str = "dst",
    normalized: bool = True,
) -> DataFrame:
    """(id, degree[, centrality]): degree / (n-1) like the reference module."""
    outs = edges.select(F.col(src_col).alias("id"))
    ins = edges.select(F.col(dst_col).alias("id"))
    keyed = {"out": outs, "in": ins}.get(direction, outs.unionAll(ins))
    deg = keyed.groupBy("id").agg(F.count("*").alias("degree"))
    if not normalized:
        return deg
    n = deg.count()
    return deg.withColumn("centrality", F.col("degree") / F.lit(max(n - 1, 1)))


def node_similarity_jaccard(
    edges: DataFrame,
    min_common: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Jaccard similarity of out-neighbor sets for all vertex pairs sharing
    >= min_common neighbors. Candidate pairs come from co-occurrence on a
    shared neighbor (one self-join keyed on the neighbor — never all pairs);
    |A∪B| = |A|+|B|-|A∩B| avoids materializing unions."""
    adj = edges.select(F.col(src_col).alias("v"), F.col(dst_col).alias("n")).dropDuplicates()
    sizes = adj.groupBy("v").agg(F.count("*").alias("sz"))
    co = (
        adj.alias("l").join(adj.alias("r"), "n")
        .filter(F.col("l.v") < F.col("r.v"))
        .groupBy(F.col("l.v").alias("v_a"), F.col("r.v").alias("v_b"))
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    return (
        co.join(sizes.withColumnsRenamed({"v": "v_a", "sz": "sz_a"}), "v_a")
        .join(sizes.withColumnsRenamed({"v": "v_b", "sz": "sz_b"}), "v_b")
        .select(
            "v_a", "v_b",
            F.round(F.col("common")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 4)
            .alias("jaccard"),
        )
    )
