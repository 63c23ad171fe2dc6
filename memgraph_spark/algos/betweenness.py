"""Betweenness centrality (Brandes) as layered DataFrame passes.

Parity: the reference's betweenness_centrality MAGE module
(src/mage/cpp/betweenness_centrality_module — sequential Brandes).

Distributed re-expression: Brandes = forward BFS with per-source path counts
(sigma) + a backward sweep accumulating dependencies (delta) layer by layer:

    delta(v) = sum over successors w on shortest paths of
               sigma_v / sigma_w * (1 + delta(w))

Both sweeps are per-layer joins + groupBy aggregations keyed on
(source, vertex) — every source in the batch is processed in the same
distributed pass (source-parallel Brandes). Wall-clock is O(diameter)
rounds regardless of source count, but STATE is (source x vertex) pairs:
exact mode (all sources) is O(V^2) rows and cannot run on a 100 TB graph.
Above BETWEENNESS_EXACT_MAX vertices the default therefore switches to the
standard sampled approximation (Brandes-Pich: uniform source sample, result
scaled by V/k) — pass exact=True to opt into exact past the fence, the same
pattern as llm/dedup's _guard_all_pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.operators.kshortest import bfs_path_counts

# exact (all-sources) Brandes keeps (source x vertex) state — refuse to
# default into it past this vertex count; sampled mode takes over instead
BETWEENNESS_EXACT_MAX = int(os.environ.get(
    "SPARK_GRAFT_BETWEENNESS_EXACT_MAX", "10000"))


def betweenness_centrality(
    graph,
    sources: DataFrame | None = None,
    etype: str | None = None,
    direction: str = "out",
    max_hops: int = 20,
    exact: bool = False,
    sample_size: int = 256,
) -> DataFrame:
    """Returns (id, betweenness).

    `sources` is an (id) DataFrame: pass it for explicit source control
    (no rescaling is applied). With sources=None, all vertices are used
    (exact Brandes) up to BETWEENNESS_EXACT_MAX vertices; beyond that a
    deterministic uniform sample of `sample_size` sources runs instead and
    the result is scaled by V/k (Brandes-Pich estimator) — opt back into
    exact with exact=True."""
    # already persisted by the catalog's shared adjacency cache; persisting
    # (and later unpersisting) it here would drop that shared entry
    edges = graph.adjacency(etype, direction)
    scale = None
    if sources is None:
        verts = graph.adjacency_vertices(etype, direction)
        n_verts = verts.count()
        if exact or n_verts <= BETWEENNESS_EXACT_MAX:
            sources = verts
        else:
            k = min(sample_size, n_verts)
            # deterministic "uniform" sample: order by a salted hash of the
            # id (no RNG state, reproducible across runs/executors)
            sources = (verts.orderBy(F.xxhash64(F.col("id"), F.lit(7)))
                       .limit(k))
            scale = n_verts / k
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
    total = F.sum("delta") * (F.lit(scale) if scale is not None else F.lit(1.0))
    result = (out.filter(F.col("id") != F.col("start"))
              .groupBy("id")
              .agg(F.round(total, 4).alias("betweenness"))
              .localCheckpoint(eager=True))
    # result is one O(V) frame; free the per-layer delta generations + the
    # (source x vertex) path-count frame instead of leaking to driver GC
    from memgraph_spark.session import free_checkpoint
    for a in acc:
        free_checkpoint(a)
    free_checkpoint(counts)
    return result
