"""Connected components + label propagation.

Parity: query_modules/wcc.py and the reference's community_detection modules
(src/mage/cpp/community_detection_module — Louvain/Leiden). WCC here is the
classic min-label propagation to fixpoint (large-star/small-star simplified);
label_propagation is synchronous LPA with a deterministic tie-break, the
scalable stand-in for Louvain-style community detection.

Each round's checkpoint carries the previous label so the fixpoint test is a
cheap aggregate over the cached blocks (no extra join job); round N-1's
checkpoint blocks are freed once round N materializes (free_checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.session import checkpoint_with_metrics, free_checkpoint


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
    import os
    # hash(a) layout for the per-round propagation join: repartition("a")
    # BEFORE the dedup costs nothing extra (HashPartitioning(a) satisfies
    # the dedup aggregate's ClusteredDistribution(a, b), so the dedup rides
    # the same single exchange) and every round's join on a reuses the
    # cached layout instead of re-shuffling the O(E) edge frame.
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    )
    if os.environ.get("SPARK_GRAFT_WCC_EDGE_LAYOUT", "a") == "a":
        und = und.repartition("a")
    und = und.dropDuplicates().persist()
    labels = (
        und.select(F.col("a").alias("id"))
        .dropDuplicates()
        .withColumn("component", F.col("id"))
        .withColumn("prev", F.lit(None).cast("long"))
        .localCheckpoint(eager=True)
    )
    def _prop(frame):
        # fresh aliases (new expr ids) so two lazy steps sharing lineage
        # can't resolve the join ambiguously
        lhs = frame.select(F.col("id").alias("__pid"),
                           F.col("component").alias("__pc"))
        nbr = (lhs.join(und, F.col("__pid") == und["a"], "inner")
               .groupBy(F.col("b").alias("id"))
               .agg(F.min("__pc").alias("nbr")))
        return (frame.select("id", F.col("component").alias("prev"))
                .join(nbr, "id", "left")
                .select("id",
                        F.least(F.col("prev"),
                                F.coalesce(F.col("nbr"),
                                           F.col("prev"))).alias("component"),
                        "prev"))

    import os
    # Two-propagations-per-checkpoint batching: the intermediate label
    # frame stays lazy; AQE's stage cache computes its exchanges once even
    # though the second step's plan embeds them twice, so per-round shuffle
    # volume is unchanged while the driver round count halves. Min-label
    # propagation is idempotent at the fixpoint, so stopping on the second
    # sub-step's changed-count yields byte-identical labels.
    batch2 = os.environ.get("SPARK_GRAFT_WCC_BATCH", "2") != "1"
    it = 0
    while it < max_iter:
        if batch2 and max_iter - it >= 2:
            new_labels, m = checkpoint_with_metrics(
                _prop(_prop(labels)),
                changed=F.count(F.when(F.col("component") != F.col("prev"),
                                       1)))
            it += 2
        else:
            new_labels, m = checkpoint_with_metrics(
                _prop(labels),
                changed=F.count(F.when(F.col("component") != F.col("prev"),
                                       1)))
            it += 1
        free_checkpoint(labels)
        labels = new_labels
        if m["changed"] == 0:
            break
    und.unpersist()
    return labels.select("id", "component")


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Synchronous LPA: each vertex adopts the most frequent label among its
    neighbors (ties -> smallest label, fully deterministic). Returns
    (id, label)."""
    import os
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    )
    # same hash(a) layout rationale as weakly_connected_components: the
    # per-round vote join is on a, and the dedup rides the one exchange
    if os.environ.get("SPARK_GRAFT_WCC_EDGE_LAYOUT", "a") == "a":
        und = und.repartition("a")
    und = und.dropDuplicates().persist()
    labels = (
        und.select(F.col("a").alias("id")).dropDuplicates()
        .withColumn("label", F.col("id"))
        .withColumn("prev", F.lit(None).cast("long"))
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
        new_labels, m = checkpoint_with_metrics(
            labels.select("id", F.col("label").alias("prev"))
            .join(best, "id", "left")
            .select("id", F.coalesce(F.col("new_label"), F.col("prev")).alias("label"),
                    "prev"),
            changed=F.count(F.when(F.col("label") != F.col("prev"), 1)))
        free_checkpoint(labels)
        labels = new_labels
        if m["changed"] == 0:
            break
    und.unpersist()
    return labels.select("id", "label")
