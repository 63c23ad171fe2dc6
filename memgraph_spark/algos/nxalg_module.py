"""nxalg.* procedure module — networkx algorithm surface.

Reference: `query_modules/nxalg.py` (78 read-procedures that materialize the
stored graph into networkx views — MemgraphGraph / MemgraphDiGraph /
MemgraphMultiGraph / MemgraphMultiDiGraph — and call the matching
`networkx.*` algorithm).

Spark-side we keep the same contract and the same execution shape the
reference chose for this module: the graph is collected to the driver
(bounded by NXALG_MAX_ELEMENTS — a driver-side algorithm cannot scale past
driver memory) and run through networkx. The distributed implementations in
`memgraph_spark.algos` (pagerank, wcc, bfs, betweenness, …) are the
100 TB path; nxalg is the long-tail parity surface, exactly as in the
reference where nxalg.py is likewise a whole-graph driver-side module.

Vertex-valued yields are node ids; edge-valued yields are edge ids (eids),
matching the engine's id-based frame representation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_ELEMENTS = int(os.environ.get("NXALG_MAX_ELEMENTS", "2000000"))


def _nx():
    try:
        import networkx
    except ImportError as exc:  # pragma: no cover - env without networkx
        raise NotImplementedError(
            "nxalg.* requires the networkx package") from exc
    return networkx


def _collect(g, weight: str | None = None):
    """Driver-side (node_ids, edge_rows) with a hard size guard.

    edge_rows: (src, dst, eid, _w). One distributed select per edge table;
    eid derives from a hash when a table has no explicit edge identity
    (same rule as operators/expand._edges_with_eid).
    """
    dfs = []
    for etype, e in g.edges.items():
        if "eid" not in e.columns:
            e = e.withColumn("eid", F.xxhash64(F.lit(etype or ""),
                                               "src", "dst"))
        w = (F.col(weight).cast("double") if weight and weight in e.columns
             else F.lit(None).cast("double"))
        dfs.append(e.select("src", "dst", "eid", w.alias("_w")))
    erows = []
    if dfs:
        edges = dfs[0]
        for d in dfs[1:]:
            edges = edges.unionByName(d)
        erows = edges.limit(_MAX_ELEMENTS + 1).collect()
    if len(erows) > _MAX_ELEMENTS:
        raise RuntimeError(
            f"nxalg: graph exceeds NXALG_MAX_ELEMENTS={_MAX_ELEMENTS} edges; "
            "use the distributed equivalents (pagerank.get, wcc.get, …)")
    nrows = g.all_nodes().select("id").limit(_MAX_ELEMENTS + 1).collect()
    if len(nrows) > _MAX_ELEMENTS:
        raise RuntimeError(
            f"nxalg: graph exceeds NXALG_MAX_ELEMENTS={_MAX_ELEMENTS} nodes")
    return [r["id"] for r in nrows], erows


def _graph(g, *, directed: bool, multi: bool, weight: str | None = None):
    """Build the requested networkx view (the reference's four Memgraph*Graph
    adapters, nxalg.py:25+). Multigraph edge keys are eids."""
    nx = _nx()
    cls = (nx.MultiDiGraph if multi else nx.DiGraph) if directed else \
        (nx.MultiGraph if multi else nx.Graph)
    G = cls()
    nodes, edges = _collect(g, weight=weight)
    G.add_nodes_from(nodes)
    for r in edges:
        attrs = {}
        if weight is not None and r["_w"] is not None:
            attrs[weight] = r["_w"]
        if multi:
            G.add_edge(r["src"], r["dst"], key=r["eid"], **attrs)
        else:
            G.add_edge(r["src"], r["dst"], **attrs)
    return G


def _subgraph(g, vertices, edges, *, directed: bool = True):
    """Subgraph view from explicit vertex/edge id lists (the reference's
    *_subgraph procedures take mgp.List[Vertex]/[Edge])."""
    nx = _nx()
    G = nx.MultiDiGraph() if directed else nx.MultiGraph()
    vset = {int(v) for v in vertices}
    G.add_nodes_from(vset)
    eids = {int(e) for e in edges}
    _, erows = _collect(g)
    for r in erows:
        if r["eid"] in eids and r["src"] in vset and r["dst"] in vset:
            G.add_edge(r["src"], r["dst"], key=r["eid"])
    return G


def _df(g, rows, schema) -> DataFrame:
    return g.spark.createDataFrame(rows, schema)


def _eid_of(G, u, v):
    """First edge key between u and v in a multigraph (the reference picks
    next(iter(g[u][v])) — nxalg.py:73)."""
    return next(iter(G[u][v]))


# --------------------------------------------------------------------------
# Table-driven wrappers: whole-graph scalar / list / per-node procedures.
# spec: (nx function name, graph kind, yield field, spark type, shape)
#   kind: 'mdg' multi-directed, 'dg' directed, 'mg' multi-undirected,
#         'ug' simple undirected
#   shape: 'scalar' | 'nodelist' (list of vertices) | 'pernode' (dict n->v)
# --------------------------------------------------------------------------

_KIND = {
    "mdg": dict(directed=True, multi=True),
    "dg": dict(directed=True, multi=False),
    "mg": dict(directed=False, multi=True),
    "ug": dict(directed=False, multi=False),
}

_SIMPLE = {
    # nxalg.py:49-362 boolean/scalar whole-graph measures
    "is_at_free": ("is_at_free", "ug", "is_at_free", "boolean"),
    "is_bipartite": ("is_bipartite", "mdg", "is_bipartite", "boolean"),
    "is_chordal": ("is_chordal", "ug", "is_chordal", "boolean"),
    "is_distance_regular": ("is_distance_regular", "mg",
                            "is_distance_regular", "boolean"),
    "is_strongly_regular": ("is_strongly_regular", "mg",
                            "is_strongly_regular", "boolean"),
    "is_eulerian": ("is_eulerian", "mdg", "is_eulerian", "boolean"),
    "is_semieulerian": ("is_semieulerian", "mdg", "is_semieulerian",
                        "boolean"),
    "has_eulerian_path": ("has_eulerian_path", "mdg", "has_eulerian_path",
                          "boolean"),
    "is_tournament": ("tournament.is_tournament", "dg", "is_tournament",
                      "boolean"),
    "is_tree": ("is_tree", "dg", "is_tree", "boolean"),
    "is_forest": ("is_forest", "dg", "is_forest", "boolean"),
    "is_arborescence": ("is_arborescence", "dg", "is_arborescence",
                        "boolean"),
    "is_branching": ("is_branching", "dg", "is_branching", "boolean"),
    "local_efficiency": ("local_efficiency", "mg", "local_efficiency",
                         "double"),
    "global_efficiency": ("global_efficiency", "mg", "global_efficiency",
                          "double"),
    "diameter": ("diameter", "mdg", "diameter", "bigint"),
    "check_planarity": ("check_planarity", "mdg", "is_planar", "boolean"),
}

_NODELISTS = {
    "topological_sort": ("topological_sort", "mdg", "nodes"),
    "center": ("center", "mdg", "center"),
    "isolates": ("isolates", "mdg", "isolates"),
}

_PERNODE = {
    "core_number": ("core_number", "dg", "node", "core", "bigint"),
}


def _nx_attr(path):
    obj = _nx()
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def _make_simple(name):
    fn_name, kind, field, typ = _SIMPLE[name]

    def proc(g):
        res = _nx_attr(fn_name)(_graph(g, **_KIND[kind]))
        if name == "check_planarity":
            res = res[0]
        if typ == "bigint":
            res = int(res)
        elif typ == "double":
            res = float(res)
        else:
            res = bool(res)
        return _df(g, [(res,)], f"{field} {typ}")
    proc.__doc__ = (f"nxalg.{name}() YIELD {field} "
                    f"(query_modules/nxalg.py, networkx.{fn_name}).")
    return proc


def _make_nodelist(name):
    fn_name, kind, field = _NODELISTS[name]

    def proc(g):
        res = [int(n) for n in _nx_attr(fn_name)(_graph(g, **_KIND[kind]))]
        return _df(g, [(res,)], f"{field} array<bigint>")
    proc.__doc__ = (f"nxalg.{name}() YIELD {field} "
                    f"(query_modules/nxalg.py, networkx.{fn_name}).")
    return proc


def _make_pernode(name):
    fn_name, kind, kf, vf, typ = _PERNODE[name]

    def proc(g):
        res = _nx_attr(fn_name)(_graph(g, **_KIND[kind]))
        rows = sorted((int(n), v) for n, v in res.items())
        return _df(g, rows, f"{kf} bigint, {vf} {typ}")
    proc.__doc__ = (f"nxalg.{name}() YIELD {kf}, {vf} "
                    f"(query_modules/nxalg.py, networkx.{fn_name}).")
    return proc


# --------------------------------------------------------------------------
# Parameterized procedures (explicit wrappers).
# --------------------------------------------------------------------------

def node_connectivity(g, source=None, target=None):
    """nxalg.node_connectivity([source, target]) YIELD connectivity."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    s = None if source is None else int(source)
    t = None if target is None else int(target)
    return _df(g, [(int(nx.node_connectivity(G, s, t)),)],
               "connectivity bigint")


def degree_assortativity_coefficient(g, x="out", y="in", weight=None,
                                     nodes=None):
    """nxalg.degree_assortativity_coefficient([x, y, weight, nodes])."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    ns = None if nodes is None else [int(n) for n in nodes]
    v = nx.degree_assortativity_coefficient(G, x, y, weight, ns)
    return _df(g, [(float(v),)], "assortativity double")


def node_boundary(g, nbunch1, nbunch2=None):
    """nxalg.node_boundary(nbunch1, [nbunch2]) YIELD boundary."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    n1 = [int(n) for n in nbunch1]
    n2 = None if nbunch2 is None else [int(n) for n in nbunch2]
    res = sorted(int(n) for n in nx.node_boundary(G, n1, n2))
    return _df(g, [(res,)], "boundary array<bigint>")


def bridges(g, root=None):
    """nxalg.bridges([root]) YIELD bridges — eids of bridge edges."""
    nx = _nx()
    Gm = _graph(g, directed=False, multi=True)
    Gs = _graph(g, directed=False, multi=False)
    r = None if root is None else int(root)
    eids = [int(_eid_of(Gm, u, v)) for u, v in nx.bridges(Gs, root=r)]
    return _df(g, [(eids,)], "bridges array<bigint>")


def betweenness_centrality(g, k=None, normalized=True, weight=None,
                           endpoints=False, seed=None):
    """nxalg.betweenness_centrality([k, normalized, weight, endpoints,
    seed]) YIELD node, betweenness."""
    nx = _nx()
    G = _graph(g, directed=True, multi=False, weight=weight)
    res = nx.betweenness_centrality(
        G, k=None if k is None else int(k), normalized=bool(normalized),
        weight=weight, endpoints=bool(endpoints),
        seed=None if seed is None else int(seed))
    rows = sorted((int(n), float(b)) for n, b in res.items())
    return _df(g, rows, "node bigint, betweenness double")


def chain_decomposition(g, root=None):
    """nxalg.chain_decomposition([root]) YIELD chains — lists of eids."""
    nx = _nx()
    Gm = _graph(g, directed=False, multi=True)
    Gs = _graph(g, directed=False, multi=False)
    r = None if root is None else int(root)
    chains = [[int(_eid_of(Gm, u, v)) for u, v in chain]
              for chain in nx.chain_decomposition(Gs, root=r)]
    return _df(g, [(chains,)], "chains array<array<bigint>>")


def find_cliques(g):
    """nxalg.find_cliques() YIELD cliques."""
    nx = _nx()
    G = _graph(g, directed=False, multi=True)
    cl = [sorted(int(n) for n in c) for c in nx.find_cliques(G)]
    return _df(g, [(sorted(cl),)], "cliques array<array<bigint>>")


def clustering(g, nodes=None, weight=None):
    """nxalg.clustering([nodes, weight]) YIELD node, clustering."""
    nx = _nx()
    G = _graph(g, directed=False, multi=False, weight=weight)
    ns = None if nodes is None else [int(n) for n in nodes]
    res = nx.clustering(G, ns, weight=weight)
    rows = sorted((int(n), float(c)) for n, c in res.items())
    return _df(g, rows, "node bigint, clustering double")


def greedy_color(g, strategy="largest_first", interchange=False):
    """nxalg.greedy_color([strategy, interchange]) YIELD node, color."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    res = nx.greedy_color(G, strategy, bool(interchange))
    rows = sorted((int(n), int(c)) for n, c in res.items())
    return _df(g, rows, "node bigint, color bigint")


def communicability(g):
    """nxalg.communicability() YIELD node1, node2, communicability."""
    nx = _nx()
    G = _graph(g, directed=False, multi=False)
    res = nx.communicability(G)
    rows = sorted((int(a), int(b), float(v))
                  for a, d in res.items() for b, v in d.items())
    return _df(g, rows, "node1 bigint, node2 bigint, communicability double")


def k_clique_communities(g, k, cliques=None):
    """nxalg.k_clique_communities(k, [cliques]) YIELD communities."""
    nx = _nx()
    G = _graph(g, directed=False, multi=True)
    cl = None if cliques is None else [[int(n) for n in c] for c in cliques]
    comms = [sorted(int(n) for n in s)
             for s in nx.community.k_clique_communities(G, int(k), cl)]
    return _df(g, [(sorted(comms),)], "communities array<array<bigint>>")


def k_components(g, density=0.95):
    """nxalg.k_components([density]) YIELD k, components."""
    nx = _nx()
    G = _graph(g, directed=False, multi=True)
    res = nx.k_components(G)
    rows = [(int(k), sorted(sorted(int(n) for n in s) for s in comps))
            for k, comps in sorted(res.items())]
    return _df(g, rows, "k bigint, components array<array<bigint>>")


def biconnected_components(g):
    """nxalg.biconnected_components() YIELD components."""
    nx = _nx()
    G = _graph(g, directed=False, multi=True)
    comps = sorted(sorted(int(n) for n in s)
                   for s in nx.biconnected_components(G))
    return _df(g, [(comps,)], "components array<array<bigint>>")


def strongly_connected_components(g):
    """nxalg.strongly_connected_components() YIELD components."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    comps = sorted(sorted(int(n) for n in s)
                   for s in nx.strongly_connected_components(G))
    return _df(g, [(comps,)], "components array<array<bigint>>")


def k_edge_components(g, k):
    """nxalg.k_edge_components(k) YIELD components."""
    nx = _nx()
    G = _graph(g, directed=True, multi=False)
    comps = sorted(sorted(int(n) for n in s)
                   for s in nx.k_edge_components(G, int(k)))
    return _df(g, [(comps,)], "components array<array<bigint>>")


def is_edge_cover(g, cover):
    """nxalg.is_edge_cover(cover: eids) YIELD is_edge_cover."""
    nx = _nx()
    G = _graph(g, directed=False, multi=True)
    eids = {int(e) for e in cover}
    pairs = {(u, v) for u, v, k in G.edges(keys=True) if k in eids}
    return _df(g, [(bool(nx.is_edge_cover(G, pairs)),)],
               "is_edge_cover boolean")


def find_cycle(g, source=None, orientation=None):
    """nxalg.find_cycle([source, orientation]) YIELD cycle — eids, or null
    when the graph is acyclic (the reference returns Record(cycle=None))."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    src = None if source is None else [int(s) for s in source]
    try:
        found = nx.find_cycle(G, src, orientation)
        eids = [int(e[2]) for e in found]
        rows = [(eids,)]
    except nx.NetworkXNoCycle:
        rows = [(None,)]
    return _df(g, rows, "cycle array<bigint>")


def simple_cycles(g):
    """nxalg.simple_cycles() YIELD cycles."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    cycles = sorted([int(n) for n in c] for c in nx.simple_cycles(G))
    return _df(g, [(cycles,)], "cycles array<array<bigint>>")


def node_expansion(g, s):
    """nxalg.node_expansion(s) YIELD node_expansion."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    v = nx.node_expansion(G, {int(n) for n in s})
    return _df(g, [(float(v),)], "node_expansion double")


def ancestors(g, source):
    """nxalg.ancestors(source) YIELD ancestors."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    res = sorted(int(n) for n in nx.ancestors(G, int(source)))
    return _df(g, [(res,)], "ancestors array<bigint>")


def descendants(g, source):
    """nxalg.descendants(source) YIELD descendants."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    res = sorted(int(n) for n in nx.descendants(G, int(source)))
    return _df(g, [(res,)], "descendants array<bigint>")


def dominance_frontiers(g, start):
    """nxalg.dominance_frontiers(start) YIELD node, frontier."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    res = nx.dominance_frontiers(G, int(start))
    rows = sorted((int(n), sorted(int(x) for x in f))
                  for n, f in res.items())
    return _df(g, rows, "node bigint, frontier array<bigint>")


def immediate_dominators(g, start):
    """nxalg.immediate_dominators(start) YIELD node, dominator."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    res = nx.immediate_dominators(G, int(start))
    rows = sorted((int(n), int(d)) for n, d in res.items())
    return _df(g, rows, "node bigint, dominator bigint")


def dominating_set(g, start):
    """nxalg.dominating_set(start) YIELD dominating_set."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    res = sorted(int(n) for n in nx.dominating_set(G, int(start)))
    return _df(g, [(res,)], "dominating_set array<bigint>")


def flow_hierarchy(g, weight=None):
    """nxalg.flow_hierarchy([weight]) YIELD flow_hierarchy."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    return _df(g, [(float(nx.flow_hierarchy(G, weight=weight)),)],
               "flow_hierarchy double")


def is_isolate(g, n):
    """nxalg.is_isolate(n) YIELD is_isolate."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    return _df(g, [(bool(nx.is_isolate(G, int(n))),)], "is_isolate boolean")


def is_isomorphic(g, nodes1, edges1, nodes2, edges2):
    """nxalg.is_isomorphic(nodes1, edges1, nodes2, edges2)."""
    nx = _nx()
    G1 = _subgraph(g, nodes1, edges1)
    G2 = _subgraph(g, nodes2, edges2)
    return _df(g, [(bool(nx.is_isomorphic(G1, G2)),)],
               "is_isomorphic boolean")


def pagerank(g, alpha=0.85, personalization=None, max_iter=100, tol=1e-06,
             nstart=None, weight="weight", dangling=None):
    """nxalg.pagerank([alpha, …]) YIELD node, rank. Property-name-valued
    personalization/nstart/dangling are resolved per node from the graph.

    Power iteration runs in pure Python on the collected graph (networkx's
    own pagerank requires scipy, absent here); same update rule and L1
    convergence test as networkx.pagerank.
    """
    G = _graph(g, directed=True, multi=False, weight=weight)

    def prop_dict(prop):
        if prop is None:
            return None
        rows = g.all_nodes(properties=[prop]).select("id", prop).collect()
        return {r["id"]: float(r[prop]) for r in rows
                if r[prop] is not None}

    n = G.number_of_nodes()
    if n == 0:
        return _df(g, [], "node bigint, rank double")
    alpha = float(alpha)
    pers = prop_dict(personalization)
    dang = prop_dict(dangling)
    x0 = prop_dict(nstart)
    if x0 is None:
        x = {v: 1.0 / n for v in G}
    else:
        s = sum(x0.values()) or 1.0
        x = {v: x0.get(v, 0.0) / s for v in G}
    if pers is None:
        p = {v: 1.0 / n for v in G}
    else:
        s = sum(pers.values()) or 1.0
        p = {v: pers.get(v, 0.0) / s for v in G}
    if dang is None:
        dweights = p
    else:
        s = sum(dang.values()) or 1.0
        dweights = {v: dang.get(v, 0.0) / s for v in G}
    out_w = {v: sum(d.get(weight, 1.0) for _, _, d in
                    G.out_edges(v, data=True)) for v in G}
    dangling_nodes = [v for v in G if out_w[v] == 0.0]
    for _ in range(int(max_iter)):
        xlast, x = x, dict.fromkeys(x, 0.0)
        danglesum = alpha * sum(xlast[v] for v in dangling_nodes)
        for u in G:
            if out_w[u] > 0:
                share = alpha * xlast[u] / out_w[u]
                for _, v, d in G.out_edges(u, data=True):
                    x[v] += share * d.get(weight, 1.0)
        for v in x:
            x[v] += danglesum * dweights[v] + (1.0 - alpha) * p[v]
        if sum(abs(x[v] - xlast[v]) for v in x) < n * float(tol):
            break
    rows = sorted((int(k), float(v)) for k, v in x.items())
    return _df(g, rows, "node bigint, rank double")


def jaccard_coefficient(g, ebunch=None):
    """nxalg.jaccard_coefficient([ebunch]) YIELD u, v, coef."""
    nx = _nx()
    G = _graph(g, directed=False, multi=False)
    eb = None if ebunch is None else [(int(a), int(b)) for a, b in ebunch]
    rows = sorted((int(u), int(v), float(c))
                  for u, v, c in nx.jaccard_coefficient(G, eb))
    return _df(g, rows, "u bigint, v bigint, coef double")


def lowest_common_ancestor(g, node1, node2):
    """nxalg.lowest_common_ancestor(node1, node2) YIELD ancestor."""
    nx = _nx()
    G = _graph(g, directed=True, multi=False)
    a = nx.lowest_common_ancestor(G, int(node1), int(node2))
    return _df(g, [(None if a is None else int(a),)], "ancestor bigint")


def maximal_matching(g):
    """nxalg.maximal_matching() YIELD edges — eids (undirected view:
    networkx matching is undirected-only)."""
    nx = _nx()
    Gm = _graph(g, directed=False, multi=True)
    Gs = _graph(g, directed=False, multi=False)
    eids = sorted(int(_eid_of(Gm, u, v)) for u, v in nx.maximal_matching(Gs))
    return _df(g, [(eids,)], "edges array<bigint>")


def non_randomness(g, k=None):
    """nxalg.non_randomness([k]) YIELD non_randomness,
    relative_non_randomness."""
    nx = _nx()
    G = _graph(g, directed=False, multi=False)
    nn, rnn = nx.non_randomness(G, k=None if k is None else int(k))
    return _df(g, [(float(nn), float(rnn))],
               "non_randomness double, relative_non_randomness double")


def reciprocity(g, nodes=None):
    """nxalg.reciprocity([nodes]) YIELD node, reciprocity."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    if nodes is None:
        rp = nx.reciprocity(G)
        rows = [(None, None if rp is None else float(rp))]
    else:
        rp = nx.reciprocity(G, [int(n) for n in nodes])
        rows = sorted((int(n), None if v is None else float(v))
                      for n, v in rp.items())
    return _df(g, rows, "node bigint, reciprocity double")


def _sp_expand(sp, source, target):
    """Normalize nx.shortest_path(_length) outputs to (src, dst, val)."""
    if source is not None and target is not None:
        return [(source, target, sp)]
    if source is not None:
        return [(source, t, v) for t, v in sp.items()]
    if target is not None:
        return [(s, target, v) for s, v in sp.items()]
    return [(s, t, v) for s, d in dict(sp).items() for t, v in d.items()]


def shortest_path(g, source=None, target=None, weight=None,
                  method="dijkstra"):
    """nxalg.shortest_path([source, target, weight, method]) YIELD source,
    target, path."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    s = None if source is None else int(source)
    t = None if target is None else int(target)
    sp = nx.shortest_path(G, source=s, target=t, weight=weight,
                          method=method)
    rows = sorted((int(a), int(b), [int(n) for n in p])
                  for a, b, p in _sp_expand(sp, s, t))
    return _df(g, rows, "source bigint, target bigint, path array<bigint>")


def shortest_path_length(g, source=None, target=None, weight=None,
                         method="dijkstra"):
    """nxalg.shortest_path_length([source, target, weight, method]) YIELD
    source, target, length."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    s = None if source is None else int(source)
    t = None if target is None else int(target)
    sp = nx.shortest_path_length(G, source=s, target=t, weight=weight,
                                 method=method)
    rows = sorted((int(a), int(b), float(v))
                  for a, b, v in _sp_expand(sp, s, t))
    return _df(g, rows, "source bigint, target bigint, length double")


def all_shortest_paths(g, source, target, weight=None, method="dijkstra"):
    """nxalg.all_shortest_paths(source, target, [weight, method]) YIELD
    paths."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    paths = sorted([int(n) for n in p] for p in nx.all_shortest_paths(
        G, int(source), int(target), weight=weight, method=method))
    return _df(g, [(paths,)], "paths array<array<bigint>>")


def has_path(g, source, target):
    """nxalg.has_path(source, target) YIELD has_path."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    return _df(g, [(bool(nx.has_path(G, int(source), int(target))),)],
               "has_path boolean")


def multi_source_dijkstra_path(g, sources, cutoff=None, weight="weight"):
    """nxalg.multi_source_dijkstra_path(sources, [cutoff, weight]) YIELD
    target, path."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    res = nx.multi_source_dijkstra_path(
        G, {int(s) for s in sources},
        cutoff=None if cutoff is None else int(cutoff), weight=weight)
    rows = sorted((int(t), [int(n) for n in p]) for t, p in res.items())
    return _df(g, rows, "target bigint, path array<bigint>")


def multi_source_dijkstra_path_length(g, sources, cutoff=None,
                                      weight="weight"):
    """nxalg.multi_source_dijkstra_path_length(sources, [cutoff, weight])
    YIELD target, length."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    res = nx.multi_source_dijkstra_path_length(
        G, {int(s) for s in sources},
        cutoff=None if cutoff is None else int(cutoff), weight=weight)
    rows = sorted((int(t), float(v)) for t, v in res.items())
    return _df(g, rows, "target bigint, length double")


def is_simple_path(g, nodes):
    """nxalg.is_simple_path(nodes) YIELD is_simple_path."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    return _df(g, [(bool(nx.is_simple_path(G, [int(n) for n in nodes])),)],
               "is_simple_path boolean")


def all_simple_paths(g, source, target, cutoff=None):
    """nxalg.all_simple_paths(source, target, [cutoff]) YIELD paths."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    paths = sorted([int(n) for n in p] for p in nx.all_simple_paths(
        G, int(source), int(target),
        cutoff=None if cutoff is None else int(cutoff)))
    return _df(g, [(paths,)], "paths array<array<bigint>>")


def bfs_edges(g, source, reverse=False, depth_limit=None):
    """nxalg.bfs_edges(source, [reverse, depth_limit]) YIELD edges — eids."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    view = G.reverse(copy=False) if reverse else G
    eids = [int(_eid_of(view, u, v))
            for u, v in nx.bfs_edges(view, int(source), depth_limit=dl)]
    return _df(g, [(eids,)], "edges array<bigint>")


def bfs_tree(g, source, reverse=False, depth_limit=None):
    """nxalg.bfs_tree(source, [reverse, depth_limit]) YIELD tree."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    tree = nx.bfs_tree(G, int(source), reverse=bool(reverse),
                       depth_limit=dl)
    return _df(g, [(sorted(int(n) for n in tree.nodes()),)],
               "tree array<bigint>")


def bfs_predecessors(g, source, depth_limit=None):
    """nxalg.bfs_predecessors(source, [depth_limit]) YIELD node,
    predecessor."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    rows = sorted((int(n), int(p)) for n, p in
                  nx.bfs_predecessors(G, int(source), depth_limit=dl))
    return _df(g, rows, "node bigint, predecessor bigint")


def bfs_successors(g, source, depth_limit=None):
    """nxalg.bfs_successors(source, [depth_limit]) YIELD node, successors."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    rows = sorted((int(n), sorted(int(x) for x in s)) for n, s in
                  nx.bfs_successors(G, int(source), depth_limit=dl))
    return _df(g, rows, "node bigint, successors array<bigint>")


def dfs_tree(g, source, depth_limit=None):
    """nxalg.dfs_tree(source, [depth_limit]) YIELD tree."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    tree = nx.dfs_tree(G, int(source), depth_limit=dl)
    return _df(g, [(sorted(int(n) for n in tree.nodes()),)],
               "tree array<bigint>")


def dfs_predecessors(g, source, depth_limit=None):
    """nxalg.dfs_predecessors(source, [depth_limit]) YIELD node,
    predecessor."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    res = nx.dfs_predecessors(G, int(source), depth_limit=dl)
    rows = sorted((int(n), int(p)) for n, p in res.items())
    return _df(g, rows, "node bigint, predecessor bigint")


def dfs_successors(g, source, depth_limit=None):
    """nxalg.dfs_successors(source, [depth_limit]) YIELD node, successors."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    res = nx.dfs_successors(G, int(source), depth_limit=dl)
    rows = sorted((int(n), sorted(int(x) for x in s))
                  for n, s in res.items())
    return _df(g, rows, "node bigint, successors array<bigint>")


def dfs_preorder_nodes(g, source, depth_limit=None):
    """nxalg.dfs_preorder_nodes(source, [depth_limit]) YIELD nodes."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    res = [int(n) for n in
           nx.dfs_preorder_nodes(G, int(source), depth_limit=dl)]
    return _df(g, [(res,)], "nodes array<bigint>")


def dfs_postorder_nodes(g, source, depth_limit=None):
    """nxalg.dfs_postorder_nodes(source, [depth_limit]) YIELD nodes."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    dl = None if depth_limit is None else int(depth_limit)
    res = [int(n) for n in
           nx.dfs_postorder_nodes(G, int(source), depth_limit=dl)]
    return _df(g, [(res,)], "nodes array<bigint>")


def edge_bfs(g, source=None, orientation=None):
    """nxalg.edge_bfs([source, orientation]) YIELD edges — eids."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    s = None if source is None else int(source)
    eids = [int(e[2]) for e in
            nx.edge_bfs(G, source=s, orientation=orientation)]
    return _df(g, [(eids,)], "edges array<bigint>")


def edge_dfs(g, source=None, orientation=None):
    """nxalg.edge_dfs([source, orientation]) YIELD edges — eids."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True)
    s = None if source is None else int(source)
    eids = [int(e[2]) for e in
            nx.edge_dfs(G, source=s, orientation=orientation)]
    return _df(g, [(eids,)], "edges array<bigint>")


def minimum_spanning_tree(g, weight="weight", algorithm="kruskal",
                          ignore_nan=False):
    """nxalg.minimum_spanning_tree([weight, algorithm, ignore_nan]) YIELD
    nodes, edges."""
    nx = _nx()
    G = _graph(g, directed=False, multi=True, weight=weight)
    tree = nx.minimum_spanning_tree(G, weight, algorithm, bool(ignore_nan))
    nodes = sorted(int(n) for n in tree.nodes())
    eids = sorted(int(k) for _, _, k in tree.edges(keys=True))
    return _df(g, [(nodes, eids)],
               "nodes array<bigint>, edges array<bigint>")


def triadic_census(g):
    """nxalg.triadic_census() YIELD triad, count."""
    nx = _nx()
    G = _graph(g, directed=True, multi=False)
    rows = sorted((t, int(c)) for t, c in nx.triadic_census(G).items())
    return _df(g, rows, "triad string, count bigint")


def voronoi_cells(g, center_nodes, weight="weight"):
    """nxalg.voronoi_cells(center_nodes, [weight]) YIELD center, cell."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    res = nx.voronoi_cells(G, {int(n) for n in center_nodes}, weight=weight)
    rows = sorted((str(c) if isinstance(c, str) else int(c),
                   sorted(int(n) for n in cell))
                  for c, cell in res.items() if c != "unreachable")
    return _df(g, [(c, cell) for c, cell in rows],
               "center bigint, cell array<bigint>")


def wiener_index(g, weight=None):
    """nxalg.wiener_index([weight]) YIELD wiener_index."""
    nx = _nx()
    G = _graph(g, directed=True, multi=True, weight=weight)
    return _df(g, [(float(nx.wiener_index(G, weight=weight)),)],
               "wiener_index double")


def weakly_connected_components_subgraph(g, vertices, edges):
    """nxalg.weakly_connected_components_subgraph(vertices, edges) YIELD
    n_components, components."""
    nx = _nx()
    G = _subgraph(g, vertices, edges)
    comps = sorted(sorted(int(n) for n in s)
                   for s in nx.weakly_connected_components(G))
    return _df(g, [(len(comps), comps)],
               "n_components bigint, components array<array<bigint>>")


def register_all(register) -> None:
    """Register every nxalg.* procedure (query_modules/nxalg.py parity)."""
    for name in _SIMPLE:
        register(f"nxalg.{name}", _make_simple(name))
    for name in _NODELISTS:
        register(f"nxalg.{name}", _make_nodelist(name))
    for name in _PERNODE:
        register(f"nxalg.{name}", _make_pernode(name))
    explicit = {
        "node_connectivity": node_connectivity,
        "degree_assortativity_coefficient": degree_assortativity_coefficient,
        "node_boundary": node_boundary,
        "bridges": bridges,
        "betweenness_centrality": betweenness_centrality,
        "chain_decomposition": chain_decomposition,
        "find_cliques": find_cliques,
        "clustering": clustering,
        "greedy_color": greedy_color,
        "communicability": communicability,
        "k_clique_communities": k_clique_communities,
        "k_components": k_components,
        "biconnected_components": biconnected_components,
        "strongly_connected_components": strongly_connected_components,
        "k_edge_components": k_edge_components,
        "is_edge_cover": is_edge_cover,
        "find_cycle": find_cycle,
        "simple_cycles": simple_cycles,
        "node_expansion": node_expansion,
        "ancestors": ancestors,
        "descendants": descendants,
        "dominance_frontiers": dominance_frontiers,
        "immediate_dominators": immediate_dominators,
        "dominating_set": dominating_set,
        "flow_hierarchy": flow_hierarchy,
        "is_isolate": is_isolate,
        "is_isomorphic": is_isomorphic,
        "pagerank": pagerank,
        "jaccard_coefficient": jaccard_coefficient,
        "lowest_common_ancestor": lowest_common_ancestor,
        "maximal_matching": maximal_matching,
        "non_randomness": non_randomness,
        "reciprocity": reciprocity,
        "shortest_path": shortest_path,
        "shortest_path_length": shortest_path_length,
        "all_shortest_paths": all_shortest_paths,
        "has_path": has_path,
        "multi_source_dijkstra_path": multi_source_dijkstra_path,
        "multi_source_dijkstra_path_length": multi_source_dijkstra_path_length,
        "is_simple_path": is_simple_path,
        "all_simple_paths": all_simple_paths,
        "bfs_edges": bfs_edges,
        "bfs_tree": bfs_tree,
        "bfs_predecessors": bfs_predecessors,
        "bfs_successors": bfs_successors,
        "dfs_tree": dfs_tree,
        "dfs_predecessors": dfs_predecessors,
        "dfs_successors": dfs_successors,
        "dfs_preorder_nodes": dfs_preorder_nodes,
        "dfs_postorder_nodes": dfs_postorder_nodes,
        "edge_bfs": edge_bfs,
        "edge_dfs": edge_dfs,
        "minimum_spanning_tree": minimum_spanning_tree,
        "triadic_census": triadic_census,
        "voronoi_cells": voronoi_cells,
        "wiener_index": wiener_index,
        "weakly_connected_components_subgraph":
            weakly_connected_components_subgraph,
    }
    for name, fn in explicit.items():
        register(f"nxalg.{name}", fn)
