"""Biconnected components and VRP routing.

Parity: the reference's biconnected_components module
(src/mage/cpp/biconnected_components_module — YIELD bcc_id, node_from,
node_to; sequential Hopcroft-Tarjan DFS) and vrp module
(src/mage/python/vrp.py — `vrp.route(depot, k)` YIELD from_vertex,
to_vertex; constraint-programming solver over a haversine matrix).

Spark's role here is the scalable part — projecting/filtering the edge and
point sets; the combinatorial cores run on the driver exactly like the
reference's (its BCC is a single-threaded DFS, its VRP a CP solver over an
in-memory matrix). The BCC collect is size-guarded: beyond `max_edges` the
caller should first split by weakly-connected component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def biconnected_components(graph, etype: str | None = None,
                           max_edges: int = 2_000_000) -> DataFrame:
    """Returns (bcc_id, node_from, node_to) — one row per edge, labeled with
    its biconnected component (iterative Hopcroft-Tarjan)."""
    und = (graph.adjacency(etype, "both")
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b")).dropDuplicates())
    n = und.count()
    if n > max_edges:
        raise ValueError(f"BCC driver guard: {n} edges > {max_edges}; "
                         "split by WCC first")
    adj: dict[int, list[int]] = {}
    for r in und.collect():
        adj.setdefault(r.a, []).append(r.b)
        adj.setdefault(r.b, []).append(r.a)
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    comp_rows: list[tuple[int, int, int]] = []
    bcc_id = 0
    timer = 0
    stack: list[tuple[int, int]] = []  # edge stack
    for root in sorted(adj):
        if root in disc:
            continue
        # iterative DFS: frames of (v, parent, child-iterator index)
        frames = [(root, -1, iter(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while frames:
            v, parent, it = frames[-1]
            advanced = False
            for w in it:
                if w == parent:
                    continue
                if w not in disc:
                    stack.append((v, w))
                    disc[w] = low[w] = timer
                    timer += 1
                    frames.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                if disc[w] < disc[v]:
                    stack.append((v, w))
                    low[v] = min(low[v], disc[w])
            if advanced:
                continue
            frames.pop()
            if frames:
                u = frames[-1][0]
                low[u] = min(low[u], low[v])
                if low[v] >= disc[u]:   # u is an articulation point (or root)
                    while stack:        # pop the component, tree edge last
                        a, b = stack.pop()
                        comp_rows.append((bcc_id, a, b))
                        if (a, b) == (u, v):
                            break
                    bcc_id += 1
    return graph.spark.createDataFrame(
        comp_rows or [], "bcc_id long, node_from long, node_to long")


def vrp_route(graph, depot_id: int, number_of_vehicles: int = 1,
              label: str | None = None):
    """vrp.route parity: (from_vertex, to_vertex) legs of k vehicle routes.
    Sweep heuristic: points partition into k angular sectors around the
    depot, each sector solved nearest-neighbour and closed at the depot."""
    import math

    from memgraph_spark.algos.tsp import create_distance_matrix
    frames = []
    for lbl, df in graph.nodes.items():
        if label and lbl != label:
            continue
        if "lat" in df.columns and "lng" in df.columns:
            frames.append(df.select("id", F.col("lat").cast("double"),
                                    F.col("lng").cast("double")))
    if not frames:
        return None
    pts = frames[0]
    for f in frames[1:]:
        pts = pts.unionByName(f)
    rows = pts.collect()
    by_id = {r.id: r for r in rows}
    if depot_id not in by_id or number_of_vehicles <= 0:
        raise ValueError("Number of vehicles must be greater than 0.")
    depot = by_id[depot_id]
    others = [r for r in rows if r.id != depot_id]
    if not others:
        return [], []
    # sweep: sort by polar angle around the depot, chunk into k sectors
    others.sort(key=lambda r: math.atan2(r.lat - depot.lat, r.lng - depot.lng))
    k = min(number_of_vehicles, len(others))
    size = (len(others) + k - 1) // k
    sectors = [others[i * size:(i + 1) * size] for i in range(k)]
    legs_from, legs_to = [], []
    for sector in sectors:
        if not sector:
            continue
        pool = list(sector)
        dm_pts = [{"lat": depot.lat, "lng": depot.lng}] + \
            [{"lat": r.lat, "lng": r.lng} for r in pool]
        dm = create_distance_matrix(dm_pts)
        order, cur = [0], 0
        remaining = set(range(1, len(dm_pts)))
        while remaining:
            nxt = min(remaining, key=lambda j: (dm[cur][j], j))
            order.append(nxt)
            remaining.discard(nxt)
            cur = nxt
        order.append(0)  # return to depot
        ids = [depot_id] + [pool[i - 1].id for i in order[1:-1]] + [depot_id]
        legs_from += ids[:-1]
        legs_to += ids[1:]
    return legs_from, legs_to
