"""Betweenness centrality (Brandes) as layered DataFrame passes.

Parity: the reference's betweenness_centrality MAGE module
(src/mage/cpp/betweenness_centrality_module — sequential Brandes).

Distributed re-expression: Brandes = forward BFS with per-source path counts
(sigma) + a backward sweep accumulating dependencies (delta) layer by layer:

    delta(v) = sum over successors w on shortest paths of
               sigma_v / sigma_w * (1 + delta(w))

Both sweeps are per-layer joins + groupBy aggregations keyed on
(source, vertex) — every source in the batch is processed in the same
distributed pass (source-parallel Brandes). Exact when `sources` is all
vertices; the standard sampled approximation otherwise. Wall-clock is
O(diameter) rounds regardless of source count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.operators.kshortest import bfs_path_counts


def betweenness_centrality(
    graph,
    sources: DataFrame | None = None,
    etype: str | None = None,
    direction: str = "out",
    max_hops: int = 20,
) -> DataFrame:
    """Returns (id, betweenness). `sources` is an (id) DataFrame — defaults
    to every vertex (exact Brandes); pass a sample for the approximation."""
    # already persisted by the catalog's shared adjacency cache; persisting
    # (and later unpersisting) it here would drop that shared entry
    edges = graph.adjacency(etype, direction)
    if sources is None:
        sources = graph.adjacency_vertices(etype, direction)
    # forward sweep: sigma = number of minimal paths per (start, id)
    counts = bfs_path_counts(graph, sources, etype, direction, max_hops) \
        .localCheckpoint(eager=True)
    max_d = counts.agg(F.max("dist")).first()[0] or 0

    # backward sweep: delta accumulates from the deepest layer inward.
    # shortest-path DAG edge u->w exists iff dist(w) = dist(u) + 1.
    delta = counts.filter(F.col("dist") == max_d).select(
        "start", "id", F.lit(0.0).alias("delta")).localCheckpoint(eager=True)
    acc = [delta]
    for d in range(max_d - 1, 0, -1):
        w_layer = (delta
                   .join(counts.select("start", "id",
                                       F.col("n_paths").alias("sigma_w")),
                         ["start", "id"]))
        contrib = (
            w_layer.join(edges, w_layer["id"] == edges["dst"], "inner")
            .select("start", F.col("src").alias("id"),
                    F.col("sigma_w"), F.col("delta"))
            .join(counts.filter(F.col("dist") == d)
                  .select("start", "id", F.col("n_paths").alias("sigma_u")),
                  ["start", "id"], "inner")  # only true DAG predecessors
            .groupBy("start", "id")
            .agg(F.sum(F.col("sigma_u") / F.col("sigma_w")
                       * (1.0 + F.col("delta"))).alias("delta"))
        )
        # vertices at layer d with no deeper successors get delta 0
        layer_d = counts.filter(F.col("dist") == d).select("start", "id")
        delta = (layer_d.join(contrib, ["start", "id"], "left")
                 .select("start", "id",
                         F.coalesce("delta", F.lit(0.0)).alias("delta"))
                 .localCheckpoint(eager=True))
        acc.append(delta)
    out = acc[0]
    for a in acc[1:]:
        out = out.unionByName(a)
    result = (out.filter(F.col("id") != F.col("start"))
              .groupBy("id")
              .agg(F.round(F.sum("delta"), 4).alias("betweenness")))
    return result
