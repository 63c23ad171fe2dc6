"""Katz centrality as iterative message passing.

Parity: the reference's katz_centrality module
(src/mage/cpp/katz_centrality_module/katz_centrality_module.cpp:61-70 —
alpha=0.2, epsilon=1e-2, YIELD node, rank).

Spark re-expression: the truncated Katz series x = sum_k alpha^k (A^T)^k 1
via the fixpoint x <- alpha * A^T (x + 1); one groupBy(dst) shuffle per
round, plans kept flat with localCheckpoint (same shape as algos/pagerank).
Each round's checkpoint carries the previous rank alongside the new one so
the convergence test is a cheap aggregate over the cached blocks (no extra
join job), and round N-1's checkpoint blocks are freed as soon as round N
is materialized (free_checkpoint) so long runs don't evict other caches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.session import (checkpoint_with_metrics, free_checkpoint,
                                    persist_if_needed)


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.2,
    epsilon: float = 1e-2,
    max_iter: int = 50,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Returns (id, rank). Converges when the max per-node change < epsilon
    (guaranteed for alpha below 1/lambda_max; bounded by max_iter)."""
    e, release_e = persist_if_needed(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")))
    vertices, release_v = persist_if_needed(
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .dropDuplicates())
    x = (vertices.select("id", F.lit(0.0).alias("rank"),
                         F.lit(0.0).alias("prev"))
         .localCheckpoint(eager=True))
    for _ in range(max_iter):
        msgs = (x.join(e, x["id"] == e["src"])
                .select(F.col("dst").alias("id"),
                        (F.lit(alpha) * (F.col("rank") + 1.0)).alias("m"))
                .groupBy("id").agg(F.sum("m").alias("recv")))
        # convergence metric rides the checkpoint job (observe) — no probe job
        nxt, m = checkpoint_with_metrics(
            x.select("id", F.col("rank").alias("prev"))
            .join(msgs, "id", "left")
            .select("id", F.coalesce("recv", F.lit(0.0)).alias("rank"),
                    "prev"),
            diff=F.max(F.abs(F.col("rank") - F.col("prev"))))
        free_checkpoint(x)
        x = nxt
        if m["diff"] is not None and m["diff"] < epsilon:
            break
    release_e()
    release_v()
    return x.select("id", "rank")
