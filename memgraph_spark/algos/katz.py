"""Katz centrality as iterative message passing.

Parity: the reference's katz_centrality module
(src/mage/cpp/katz_centrality_module/katz_centrality_module.cpp:61-70 —
alpha=0.2, epsilon=1e-2, YIELD node, rank).

Spark re-expression: the truncated Katz series x = sum_k alpha^k (A^T)^k 1
via the fixpoint x <- alpha * A^T (x + 1); one groupBy(dst) shuffle per
round, plans kept flat with localCheckpoint (same shape as algos/pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).persist()
    vertices = (e.select(F.col("src").alias("id"))
                .unionAll(e.select(F.col("dst").alias("id")))
                .dropDuplicates().persist())
    x = vertices.select("id", F.lit(0.0).alias("rank")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = (x.join(e, x["id"] == e["src"])
                .select(F.col("dst").alias("id"),
                        (F.lit(alpha) * (F.col("rank") + 1.0)).alias("m"))
                .groupBy("id").agg(F.sum("m").alias("recv")))
        nxt = (vertices.join(msgs, "id", "left")
               .select("id", F.coalesce("recv", F.lit(0.0)).alias("rank"))
               .localCheckpoint(eager=True))
        diff = (nxt.join(x.withColumnRenamed("rank", "prev"), "id")
                .agg(F.max(F.abs(F.col("rank") - F.col("prev")))).first()[0])
        x = nxt
        if diff is not None and diff < epsilon:
            break
    e.unpersist()
    vertices.unpersist()
    return x
