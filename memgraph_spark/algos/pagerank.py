"""PageRank as iterative DataFrame message passing.

Parity: the reference's pagerank module (src/mage/cpp/pagerank_module/,
power-iteration over the in-memory graph). Spark re-expression: per round,
rank mass flows src->dst through one groupBy(dst) shuffle; dangling mass is
redistributed uniformly. Out-degrees and the edge list are computed once and
persisted; each round's plan is O(1) deep thanks to localCheckpoint.

Per-round job budget: the checkpointed rank frame carries (deg, prev) so the
dangling-mass probe and the L1-delta convergence probe are ONE aggregate
scan over the cached blocks — no extra joins. Round N-1's checkpoint blocks
are freed once round N materializes (free_checkpoint), so long runs don't
evict other caches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.session import (checkpoint_with_metrics, free_checkpoint,
                                    persist_if_needed)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1.0e-6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Returns (id, rank); ranks sum to 1. `edges` is any (src, dst) DataFrame.

    Convergence: stops when L1 rank delta < tol (folded into the dangling
    probe) or after max_iter rounds. Partition strategy: ranks and edges are
    both hash-partitioned on the vertex id by the groupBy, so consecutive
    rounds reuse the exchange (AQE coalesces the small rank side).
    """
    e, release_e = persist_if_needed(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")))
    vertices, release_v = persist_if_needed(
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    n = vertices.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))

    # rank frame schema: (id, rank, prev, deg) — deg null marks dangling
    # the dangling-mass + convergence-delta probe rides each checkpoint's
    # materialization job via observe — zero extra jobs per round
    _metrics = dict(
        dangling=F.coalesce(
            F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)),
        delta=F.sum(F.abs(F.col("rank") - F.col("prev"))),
    )
    ranks, m = checkpoint_with_metrics(
        vertices.join(out_deg, vertices["id"] == out_deg["src"], "left")
        .select(vertices["id"], F.lit(1.0 / n).alias("rank"),
                F.lit(0.0).alias("prev"), "deg"),
        **_metrics)
    for _ in range(max_iter):
        if tol is not None and m["delta"] is not None and m["delta"] < tol:
            break
        dangling = m["dangling"]
        msgs = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks["id"] == e["src"], "inner")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("m"))
            .groupBy("id").agg(F.sum("m").alias("recv"))
        )
        new_ranks, m = checkpoint_with_metrics(
            ranks.select("id", F.col("rank").alias("prev"), "deg")
            .join(msgs, "id", "left")
            .select(
                "id",
                (F.lit((1 - damping) / n)
                 + F.lit(damping) * (F.coalesce(F.col("recv"), F.lit(0.0))
                                     + F.lit(dangling / n))).alias("rank"),
                "prev", "deg",
            ),
            **_metrics)
        free_checkpoint(ranks)
        ranks = new_ranks
    release_e(); release_v()
    return ranks.select("id", "rank")
