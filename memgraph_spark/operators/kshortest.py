"""K-shortest paths (Yen) + all-shortest-paths counting (SURVEY §2.3).

Reference: KShortestPaths — Yen's algorithm atop Dijkstra
(operator.cpp:3716, InitializeKShortestPaths :3889, ~540 LoC);
ExpandAllShortestPaths keeps all argmin predecessors (:3309).

Spark re-expression:
- Dijkstra runs as distributed iterative relaxation keeping the argmin
  predecessor per vertex (min over a packed (cost, pred) struct);
- path reconstruction walks predecessors — O(path length) point lookups,
  bounded by the hop limit, never proportional to graph size;
- Yen's spur loop is driver-side control flow (as in the reference), but
  every shortest-path computation inside it is fully distributed;
- all-shortest-path *counting* is BFS-layered dynamic programming: the number
  of minimal paths to v at depth d is the sum over in-neighbors at depth d-1
  — one join + groupBy per layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dijkstra_pred(edges: DataFrame, source_id: int,
                   max_iterations: int = 30) -> DataFrame:
    """Single-source Dijkstra-as-relaxation returning (id, cost, pred).
    `edges` = (src, dst, w)."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(source_id, 0.0, None)], "id long, cost double, pred long"
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_iterations):
        cand = (
            frontier.join(edges, frontier["id"] == edges["src"], "inner")
            .select(F.col("dst").alias("id"),
                    (F.col("cost") + F.col("w")).alias("cost"),
                    F.col("src").alias("pred"))
            .groupBy("id")
            .agg(F.min(F.struct("cost", "pred")).alias("s"))
            .select("id", F.col("s.cost").alias("cost"),
                    F.col("s.pred").alias("pred"))
        )
        improved = (
            cand.join(dist.select("id", F.col("cost").alias("__old")),
                      "id", "left")
            .filter(F.col("__old").isNull() | (F.col("cost") < F.col("__old")))
            .select("id", "cost", "pred")
            .localCheckpoint(eager=True)
        )
        if improved.count() == 0:
            break
        dist = (
            dist.unionByName(improved)
            .groupBy("id")
            .agg(F.min(F.struct("cost", "pred")).alias("s"))
            .select("id", F.col("s.cost").alias("cost"),
                    F.col("s.pred").alias("pred"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return dist


def _walk_path(dist: DataFrame, source_id: int, target_id: int,
               max_hops: int = 64) -> tuple[list[int], float] | None:
    row = dist.filter(F.col("id") == target_id).first()
    if row is None:
        return None
    cost = row["cost"]
    path = [target_id]
    cur = row["pred"]
    for _ in range(max_hops):
        if cur is None:
            break
        path.append(cur)
        if cur == source_id:
            return list(reversed(path)), cost
        cur = dist.filter(F.col("id") == cur).first()["pred"]
    return (list(reversed(path)), cost) if path[-1] == source_id else None


def shortest_path_with_nodes(graph, source_id: int, target_id: int,
                             etype: str | None = None,
                             weight_col: str | None = None,
                             edges_df: DataFrame | None = None):
    """One weighted shortest path as (node_id list, cost)."""
    e = _weighted_edges(graph, etype, weight_col, edges_df)
    dist = _dijkstra_pred(e, source_id)
    return _walk_path(dist, source_id, target_id)


def _weighted_edges(graph, etype, weight_col, edges_df) -> DataFrame:
    if edges_df is not None:
        return edges_df.select("src", "dst", F.col(weight_col or "w")
                               .cast("double").alias("w"))
    base = graph.edge(etype) if etype else \
        graph.all_edges(properties=[weight_col] if weight_col else None)
    w = (F.col(weight_col).cast("double") if weight_col else F.lit(1.0))
    return base.select("src", "dst", w.alias("w"))


def k_shortest_paths(graph, source_id: int, target_id: int, k: int = 3,
                     etype: str | None = None, weight_col: str | None = None,
                     edges_df: DataFrame | None = None) -> list[tuple[list[int], float]]:
    """Yen's algorithm (operator.cpp:3716): k loopless shortest paths as
    (node-id list, cost), cheapest first. The spur loop is driver-side (same
    as the reference); each inner shortest-path run is distributed."""
    from memgraph_spark.session import persist_if_needed
    e, release_e = persist_if_needed(
        _weighted_edges(graph, etype, weight_col, edges_df))
    try:
        first = _walk_path(_dijkstra_pred(e, source_id), source_id, target_id)
        if first is None:
            return []
        paths: list[tuple[list[int], float]] = [first]
        candidates: list[tuple[list[int], float]] = []
        while len(paths) < k:
            prev_path = paths[-1][0]
            for i in range(len(prev_path) - 1):
                spur, root = prev_path[i], prev_path[: i + 1]
                # remove edges used by known paths sharing this root prefix
                banned = {(p[i], p[i + 1]) for p, _ in paths
                          if len(p) > i + 1 and p[: i + 1] == root}
                root_nodes = set(root[:-1])
                filt = e.filter(
                    ~F.struct(F.col("src"), F.col("dst")).isin(
                        [F.struct(F.lit(a).cast("long").alias("src"),
                                  F.lit(b).cast("long").alias("dst"))
                         for a, b in banned])
                    if banned else F.lit(True))
                if root_nodes:
                    filt = filt.filter(~F.col("src").isin(list(root_nodes))
                                       & ~F.col("dst").isin(list(root_nodes)))
                spur_hit = _walk_path(_dijkstra_pred(filt, spur),
                                      spur, target_id)
                if spur_hit is None:
                    continue
                spur_path, spur_cost = spur_hit
                root_cost = _path_cost(e, root)
                total = root[:-1] + spur_path
                if all(total != p for p, _ in paths + candidates):
                    candidates.append((total, root_cost + spur_cost))
            if not candidates:
                break
            candidates.sort(key=lambda t: (t[1], t[0]))
            paths.append(candidates.pop(0))
        return paths
    finally:
        release_e()


def _path_cost(e: DataFrame, path: list[int]) -> float:
    if len(path) < 2:
        return 0.0
    pairs = list(zip(path[:-1], path[1:]))
    cond = None
    for a, b in pairs:
        c = (F.col("src") == a) & (F.col("dst") == b)
        cond = c if cond is None else (cond | c)
    rows = e.filter(cond).groupBy("src", "dst").agg(F.min("w").alias("w")) \
        .collect()
    costs = {(r["src"], r["dst"]): r["w"] for r in rows}
    return float(sum(costs[p] for p in pairs))


def bfs_path_counts(graph, sources: DataFrame, etype: str | None = None,
                    direction: str = "out", max_hops: int = 20,
                    source_col: str = "id") -> DataFrame:
    """ExpandAllShortestPaths parity for hop-weighted graphs: (start, id,
    dist, n_paths) where n_paths counts the distinct minimal-hop paths.
    Layered DP: counts at depth d = sum of counts of depth-(d-1) in-neighbors
    — one join + one groupBy per layer, no path materialization."""
    edges = graph.adjacency(etype, direction)
    layer = sources.select(
        F.col(source_col).alias("start"), F.col(source_col).alias("id"),
        F.lit(0).alias("dist"), F.lit(1).cast("long").alias("n_paths"),
    ).localCheckpoint(eager=True)
    visited = layer
    from memgraph_spark.session import checkpoint_with_metrics
    for d in range(1, max_hops + 1):
        # layer row count rides the checkpoint job (observe)
        nxt, m = checkpoint_with_metrics(
            layer.join(edges, layer["id"] == edges["src"], "inner")
            .groupBy("start", F.col("dst").alias("id"))
            .agg(F.sum("n_paths").alias("n_paths"))
            .join(visited.select("start", "id").withColumn("__seen", F.lit(1)),
                  ["start", "id"], "left_anti")
            .withColumn("dist", F.lit(d))
            .select("start", "id", "dist", "n_paths"),
            n=F.count(F.lit(1)),
        )
        if m["n"] == 0:
            break
        visited = visited.unionByName(nxt)
        layer = nxt
    return visited
