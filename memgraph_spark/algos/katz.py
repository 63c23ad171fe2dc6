"""Katz centrality as iterative message passing.

Parity: the reference's katz_centrality module
(src/mage/cpp/katz_centrality_module/katz_centrality_module.cpp:61-70 —
alpha=0.2, epsilon=1e-2, YIELD node, rank).

Spark re-expression: the truncated Katz series x = sum_k alpha^k (A^T)^k 1
via the fixpoint x <- alpha * A^T (x + 1). Shuffle shape per round: the edge
list is hash-partitioned on dst ONCE and cached; the (small) rank frame is
broadcast into the edge join, so the per-dst aggregation reuses the cached
partitioning and a round runs without re-shuffling the edges. Past the
broadcast threshold the rank frame shuffles by src instead — the edges still
never move. Convergence metrics ride the checkpoint job (observe), and round
N-1's checkpoint blocks are freed as soon as round N materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.session import checkpoint_with_metrics, free_checkpoint


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
    from memgraph_spark.operators.expand import (BROADCAST_FRONTIER_ROWS,
                                                 _maybe_broadcast)
    raw = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    x, m0 = checkpoint_with_metrics(
        raw.select(F.col("src").alias("id"))
        .unionAll(raw.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .select("id", F.lit(0.0).alias("rank"), F.lit(0.0).alias("prev")),
        n=F.count(F.lit(1)))
    small = m0["n"] <= BROADCAST_FRONTIER_ROWS
    # Partition the edge list ONCE by whichever key each round's joins need,
    # so rounds never re-shuffle it: with a broadcast-able rank frame the
    # edge join is map-side and the per-dst aggregation reuses a dst layout;
    # past the broadcast threshold the join itself needs a src layout (the
    # small rank side shuffles, the edges stay put) and only the messages
    # shuffle for the aggregation. Column-only repartition (no explicit
    # count) keeps AQE free to coalesce small inputs — matters under the
    # driver's vanilla session where shuffle.partitions defaults to 200.
    e = raw.repartition("dst" if small else "src").persist()
    for _ in range(max_iter):
        lhs = _maybe_broadcast(x, m0["n"])
        msgs = (lhs.join(e, x["id"] == e["src"])
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
    e.unpersist()
    return x.select("id", "rank")
