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
    its biconnected component (iterative Hopcroft-Tarjan). Past `max_edges`
    the fence is a ROUTING choice: the distributed spanning-tree +
    fundamental-cycle variant runs instead (same output contract, bcc ids
    arbitrary in both)."""
    und = (graph.adjacency(etype, "both")
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b")).dropDuplicates())
    n = und.count()
    if n > max_edges:
        return biconnected_components_distributed(graph, etype)
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


def biconnected_components_distributed(graph, etype: str | None = None,
                                       max_rounds: int = 256) -> DataFrame:
    """Distributed BCC (Tarjan-Vishkin flavour, VERDICT r3 item 7):

    1. BFS spanning forest (one tree per weakly-connected component,
       root = min vertex id; deterministic min-parent tie-break).
    2. Every non-tree edge (u, v) closes a fundamental cycle through the
       tree path u..LCA..v. The cycle is materialized by LIFTING the
       deeper endpoint one tree level per round (rounds <= tree depth <=
       component diameter), emitting (cycle, tree-edge) incidence links.
    3. Two edges share a BCC iff they are connected through fundamental
       cycles sharing edges — exactly connected components of the
       bipartite incidence graph {tree edges} x {non-tree edges}.
       hash-min CC labels it; untouched tree edges are bridges (their own
       singleton BCC).

    Everything is DataFrame joins — the only driver state is the loop
    counters. Output matches the driver core's contract: one row per
    undirected edge, (bcc_id, node_from, node_to), ids arbitrary."""
    from memgraph_spark.algos.components import weakly_connected_components
    from memgraph_spark.session import checkpoint_with_metrics, free_checkpoint
    spark = graph.spark
    und = (graph.adjacency(etype, "both")
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b")).dropDuplicates().persist())
    empty = spark.createDataFrame(
        [], "bcc_id long, node_from long, node_to long")
    if und.isEmpty():
        und.unpersist()
        return empty
    adj = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionAll(und.select(F.col("b").alias("src"),
                                F.col("a").alias("dst"))).persist())

    # -- 1. BFS forest: component label = min vertex id = the root
    comp = weakly_connected_components(und, "a", "b",
                                       max_iter=max_rounds)
    roots = comp.filter(F.col("id") == F.col("component")).select("id")
    frontier, m = checkpoint_with_metrics(
        roots.select("id", F.lit(None).cast("long").alias("parent"),
                     F.lit(0).alias("depth")),
        n=F.count(F.lit(1)))
    visited = frontier
    tree_pieces = []
    depth = 0
    for depth in range(1, max_rounds + 1):
        nxt = (frontier.join(adj, frontier["id"] == adj["src"])
               .select(F.col("dst").alias("nid"),
                       F.col("id").alias("nparent"))
               .join(visited.select(F.col("id").alias("nid")),
                     "nid", "left_anti")
               .groupBy("nid").agg(F.min("nparent").alias("parent"))
               .select(F.col("nid").alias("id"), "parent",
                       F.lit(depth).alias("depth")))
        nxt, m = checkpoint_with_metrics(nxt, n=F.count(F.lit(1)))
        if m["n"] == 0:
            break
        tree_pieces.append(nxt)
        visited = visited.unionByName(nxt)
        frontier = nxt
    if m["n"] > 0:
        # the loop exhausted max_rounds with a live frontier. That is
        # fine when the BFS depth is EXACTLY max_rounds (the last
        # frontier is the deepest, fully-visited level); only nodes
        # beyond it would silently vanish from the spanning forest — so
        # probe the would-be next frontier and fail loudly only if it
        # is non-empty.
        unexplored = (frontier.join(adj, frontier["id"] == adj["src"])
                      .select(F.col("dst").alias("nid"))
                      .join(visited.select(F.col("id").alias("nid")),
                            "nid", "left_anti"))
        if not unexplored.isEmpty():
            raise ValueError(
                f"biconnected_components: spanning-tree BFS did not "
                f"converge within max_rounds={max_rounds} (graph depth "
                "exceeds it); raise max_rounds")
    if not tree_pieces:
        und.unpersist(); adj.unpersist()
        return empty
    tree = tree_pieces[0]
    for p in tree_pieces[1:]:
        tree = tree.unionByName(p)
    # (child, parent, depth) persisted — the lifting loop joins it per round
    tree = tree.localCheckpoint(eager=True)
    for p in tree_pieces:
        free_checkpoint(p)

    # -- 2. non-tree edges + lifting
    tpairs = tree.select(F.least("id", "parent").alias("a"),
                         F.greatest("id", "parent").alias("b"))
    nontree = (und.join(tpairs, ["a", "b"], "left_anti")
               .withColumn("cyc", -F.abs(F.xxhash64("a", "b")) - F.lit(1)))
    dmap = tree.select("id", "depth").unionByName(
        roots.select("id", F.lit(0).alias("depth")))
    pmap = tree.select("id", "parent")
    state = (nontree
             .join(dmap.select(F.col("id").alias("a"),
                               F.col("depth").alias("da")), "a")
             .join(dmap.select(F.col("id").alias("b"),
                               F.col("depth").alias("db")), "b")
             .select("cyc", F.col("a").alias("u"), "da",
                     F.col("b").alias("v"), "db"))
    state, m = checkpoint_with_metrics(
        state, n=F.count(F.when(F.col("u") != F.col("v"), 1)))
    link_pieces = []
    rounds = 0
    while m["n"] > 0 and rounds < max_rounds:
        rounds += 1
        active = state.filter(F.col("u") != F.col("v"))
        lift_u = F.col("da") >= F.col("db")
        lift_v = F.col("db") >= F.col("da")
        links = (active.select("cyc", F.when(lift_u, F.col("u"))
                               .alias("child"))
                 .unionAll(active.select("cyc", F.when(lift_v, F.col("v"))
                                         .alias("child")))
                 .filter(F.col("child").isNotNull()))
        link_pieces.append(links.localCheckpoint(eager=True))
        nu = (active.join(pmap.withColumnRenamed("id", "u")
                          .withColumnRenamed("parent", "pu"), "u", "left"))
        nv = (nu.join(pmap.withColumnRenamed("id", "v")
                      .withColumnRenamed("parent", "pv"), "v", "left"))
        stepped = nv.select(
            "cyc",
            F.when(lift_u, F.col("pu")).otherwise(F.col("u")).alias("u"),
            F.when(lift_u, F.col("da") - 1).otherwise(F.col("da"))
            .alias("da"),
            F.when(lift_v, F.col("pv")).otherwise(F.col("v")).alias("v"),
            F.when(lift_v, F.col("db") - 1).otherwise(F.col("db"))
            .alias("db"))
        done = state.filter(F.col("u") == F.col("v"))
        new_state, m = checkpoint_with_metrics(
            stepped.unionByName(done),
            n=F.count(F.when(F.col("u") != F.col("v"), 1)))
        free_checkpoint(state)
        state = new_state
    if m["n"] > 0:
        # unfinished cycles would be mislabeled as already-lifted — raise
        # rather than return a partial labeling
        raise ValueError(
            f"biconnected_components: cycle lifting did not converge "
            f"within max_rounds={max_rounds}; raise max_rounds")

    # -- 3. incidence CC: {tree child ids (>=0 node space)} x {cyc (<0)}
    if link_pieces:
        links = link_pieces[0]
        for p in link_pieces[1:]:
            links = links.unionByName(p)
        links = links.dropDuplicates()
        cc = weakly_connected_components(links, "cyc", "child",
                                         max_iter=max_rounds)
        lab = cc.select("id", F.col("component").alias("bcc_id"))
        tree_lab = (tree.join(lab, "id", "left")
                    .select(F.coalesce("bcc_id",
                                       F.col("id")).alias("bcc_id"),
                            F.col("parent").alias("node_from"),
                            F.col("id").alias("node_to")))
        non_lab = (nontree.join(lab.withColumnRenamed("id", "cyc"), "cyc")
                   .select("bcc_id", F.col("a").alias("node_from"),
                           F.col("b").alias("node_to")))
        out = tree_lab.unionByName(non_lab)
    else:
        # forest: every edge is a bridge
        out = tree.select(F.col("id").alias("bcc_id"),
                          F.col("parent").alias("node_from"),
                          F.col("id").alias("node_to"))
    # dense ids for tidiness (distinct labels ~ #BCCs, a metadata frame)
    from pyspark.sql import Window
    ids = (out.select("bcc_id").dropDuplicates()
           .withColumn("__d", F.row_number().over(
               Window.orderBy("bcc_id")) - 1))
    res = (out.join(ids, "bcc_id")
           .select(F.col("__d").alias("bcc_id"), "node_from", "node_to"))
    res = res.localCheckpoint(eager=True)
    und.unpersist(); adj.unpersist()
    free_checkpoint(tree)
    return res


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
