"""PageRank as iterative DataFrame message passing.

Parity: the reference's pagerank module (src/mage/cpp/pagerank_module/,
power-iteration over the in-memory graph). Spark re-expression: per round,
rank mass flows src->dst through one groupBy(dst) shuffle; dangling mass is
redistributed uniformly. Out-degrees and the edge list are computed once and
persisted; each round's plan is O(1) deep thanks to localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1.0e-6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Returns (id, rank); ranks sum to 1. `edges` is any (src, dst) DataFrame.

    Convergence: stops when L1 rank delta < tol (one extra agg per round) or
    after max_iter rounds. Partition strategy: ranks and edges are both
    hash-partitioned on the vertex id by the groupBy, so consecutive rounds
    reuse the exchange (AQE coalesces the small rank side).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).persist()
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .persist()
    )
    n = vertices.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()

    ranks = vertices.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        contrib_src = (
            ranks.join(out_deg, ranks["id"] == out_deg["src"], "left")
            .select(ranks["id"], "rank", "deg")
        )
        # mass from dangling nodes (no out-edges) is spread uniformly
        dangling = contrib_src.filter(F.col("deg").isNull()) \
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")).first()["m"]
        msgs = (
            contrib_src.filter(F.col("deg").isNotNull())
            .join(e, contrib_src["id"] == e["src"], "inner")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("m"))
            .groupBy("id").agg(F.sum("m").alias("recv"))
        )
        new_ranks = (
            vertices.join(msgs, "id", "left")
            .select(
                "id",
                (F.lit((1 - damping) / n)
                 + F.lit(damping) * (F.coalesce(F.col("recv"), F.lit(0.0))
                                     + F.lit(dangling / n))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "r2")
                .join(ranks, "id")
                .agg(F.sum(F.abs(F.col("r2") - F.col("rank"))).alias("d"))
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    e.unpersist(); vertices.unpersist(); out_deg.unpersist()
    return ranks
