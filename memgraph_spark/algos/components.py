"""Connected components + label propagation.

Parity: query_modules/wcc.py and the reference's community_detection modules
(src/mage/cpp/community_detection_module — Louvain/Leiden). WCC here is the
classic min-label propagation to fixpoint (large-star/small-star simplified);
label_propagation is synchronous LPA with a deterministic tie-break, the
scalable stand-in for Louvain-style community detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weakly_connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Returns (id, component) where component = min vertex id reachable via
    undirected paths. Per round each vertex adopts the min label among itself
    and its neighbors; converges in O(diameter) rounds (use doubling/star
    contraction if diameters grow past ~20 at scale)."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .dropDuplicates()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("id"))
        .dropDuplicates()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            labels.join(und, labels["id"] == und["a"], "inner")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select("id",
                    F.least(F.col("component"),
                            F.coalesce(F.col("nbr"), F.col("component"))).alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("component", "c2")
            .join(labels, "id")
            .filter(F.col("c2") != F.col("component"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Synchronous LPA: each vertex adopts the most frequent label among its
    neighbors (ties -> smallest label, fully deterministic). Returns
    (id, label)."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .dropDuplicates()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("id")).dropDuplicates()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        votes = (
            labels.join(und, labels["id"] == und["a"], "inner")
            .groupBy(F.col("b").alias("id"), F.col("label"))
            .agg(F.count("*").alias("n"))
        )
        # argmax by (n desc, label asc) via max over packed struct
        best = (
            votes.groupBy("id")
            .agg(F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias("s"))
            .select("id", (-F.col("s.neg")).alias("new_label"))
        )
        new_labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce(F.col("new_label"), F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "l2")
            .join(labels, "id")
            .filter(F.col("l2") != F.col("label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels
