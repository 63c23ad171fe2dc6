"""Property-based checks against pure-python reference implementations
(SURVEY §5: the reference couples unit suites with randomized stress tests;
hypothesis generates small random graphs, pure-python oracles check the
distributed results)."""

from collections import deque

from hypothesis import HealthCheck, given, settings, strategies as st

from memgraph_spark.algos import (
    bridges,
    spanning_tree,
    weakly_connected_components,
)
from memgraph_spark.catalog import load_tpch_graph
from memgraph_spark.operators.expand import bfs
from tests.conftest import SF_SMOKE

SETTINGS = dict(max_examples=5, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

edge_lists = st.lists(
    st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20, unique=True)


def _graph(spark, edges):
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(edges, "src long, dst long")}
    g._adj_cache.clear()
    return g


def _py_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_wcc_matches_union_find(spark, edges):
    g = _graph(spark, edges)
    ours = {r.id: r.component
            for r in weakly_connected_components(g.edge("E")).collect()}
    ref = _py_components(edges)
    # same partition: identical grouping of nodes
    by_ours, by_ref = {}, {}
    for n in ref:
        by_ours.setdefault(ours[n], set()).add(n)
        by_ref.setdefault(ref[n], set()).add(n)
    assert {frozenset(s) for s in by_ours.values()} == \
        {frozenset(s) for s in by_ref.values()}


def _py_bfs(edges, source):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    dist = {source: 0}
    dq = deque([source])
    while dq:
        v = dq.popleft()
        for w in adj.get(v, []):
            if w not in dist:
                dist[w] = dist[v] + 1
                dq.append(w)
    return dist


@given(edges=edge_lists, src_pick=st.integers(0, 100))
@settings(**SETTINGS)
def test_bfs_matches_python(spark, edges, src_pick):
    source = edges[src_pick % len(edges)][0]
    g = _graph(spark, edges)
    srcs = spark.createDataFrame([(source,)], "id long")
    ours = {r.id: r.dist for r in bfs(g, srcs, "E", "out", 15).collect()}
    assert ours == _py_bfs(edges, source)


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_spanning_forest_structure(spark, edges):
    g = _graph(spark, edges)
    tree = [(r.src, r.dst) for r in spanning_tree(g, etype="E").collect()]
    comp = _py_components([(a, b) for a, b in edges])
    n_nodes = len(comp)
    n_comps = len(set(comp.values()))
    assert len(tree) == n_nodes - n_comps        # spanning forest size
    assert len(set(tree)) == len(tree)           # no duplicate edges
    # tree edges connect the same partition (acyclic by edge count + same WCC)
    tcomp = _py_components(tree)
    for a, b in tree:
        assert comp[a] == comp[b]
    assert len(set(tcomp.values())) == n_comps


def _py_bridges(edges):
    adj = {}
    for a, b in set(map(tuple, map(sorted, edges))):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    disc, low, out = {}, {}, set()
    t = [0]

    def dfs(v, parent):
        disc[v] = low[v] = t[0]
        t[0] += 1
        for w in adj[v]:
            if w == parent:
                continue
            if w not in disc:
                dfs(w, v)
                low[v] = min(low[v], low[w])
                if low[w] > disc[v]:
                    out.add(tuple(sorted((v, w))))
            else:
                low[v] = min(low[v], disc[w])
    import sys
    sys.setrecursionlimit(10_000)
    for v in adj:
        if v not in disc:
            dfs(v, None)
    return out


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_bridges_match_dfs(spark, edges):
    g = _graph(spark, edges)
    ours = {tuple(sorted((r.node_from, r.node_to)))
            for r in bridges(g).collect()}
    assert ours == _py_bridges(edges)
