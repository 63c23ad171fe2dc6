"""Bridges, cycles, bipartite matching, union-find, kmeans, set cover, knn
(reference bridges/cycles/bipartite_matching/union_find/kmeans/set_cover/knn
modules)."""

from pyspark.sql import functions as F

from memgraph_spark.algos import (
    bipartite_matching,
    bridges,
    fundamental_cycles,
    kmeans,
    set_cover_greedy,
    union_find_connected,
)
from memgraph_spark.catalog import graph_for, load_tpch_graph
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE


def _graph(spark, edges):
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(edges, "src long, dst long")}
    g._adj_cache.clear()
    return g


def test_bridges_barbell(spark):
    # two triangles joined by a bridge 3-4; plus a pendant 6-7 (also a bridge)
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6),
                       (3, 4), (6, 7)])
    b = {tuple(sorted((r.node_from, r.node_to))) for r in bridges(g).collect()}
    assert b == {(3, 4), (6, 7)}


def test_bridges_cycle_free_graph(spark):
    # a tree: every edge is a bridge
    g = _graph(spark, [(1, 2), (2, 3), (2, 4)])
    b = {tuple(sorted((r.node_from, r.node_to))) for r in bridges(g).collect()}
    assert b == {(1, 2), (2, 3), (2, 4)}


def test_fundamental_cycles(spark):
    g = _graph(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    rows = fundamental_cycles(g).collect()
    assert {r.cycle_id for r in rows} == {0}
    assert sorted(r.node for r in rows) == [1, 2, 3]


def test_bipartite_matching_perfect(spark):
    # K_{2,2} minus one edge: matching of size 2
    g = _graph(spark, [(1, 3), (1, 4), (2, 4)])
    assert bipartite_matching(g) == 2


def test_bipartite_matching_odd_cycle(spark):
    g = _graph(spark, [(1, 2), (2, 3), (3, 1)])
    assert bipartite_matching(g) == 0  # not bipartite


def test_union_find_connected(spark):
    g = _graph(spark, [(1, 2), (2, 3), (4, 5)])
    r = {(x.node1, x.node2): x.connected
         for x in union_find_connected(g, [1, 1], [3, 4]).collect()}
    assert r[(1, 3)] is True and r[(1, 4)] is False
    r2 = union_find_connected(g, [1], [2, 4], mode="cartesian").collect()
    assert len(r2) == 2


def test_kmeans_separated_clusters(spark):
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)] + \
           [(10 + i, [10.0 + i * 0.01, 10.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    r = kmeans(df, 2, seed=7).collect()
    by_cluster = {}
    for row in r:
        by_cluster.setdefault(row.cluster_id, set()).add(row.id)
    assert len(by_cluster) == 2
    assert {frozenset(v) for v in by_cluster.values()} == \
        {frozenset(range(5)), frozenset(range(10, 15))}


def test_set_cover_greedy(spark):
    # set 100 covers {1,2,3}; sets 101/102 cover one element each
    pairs = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (1, 101), (4, 102)],
        "element long, containing_set long")
    assert set_cover_greedy(pairs) == [100, 102]


def test_knn_procedure(spark):
    gs = GraphSession(graph_for(spark, SF_SMOKE))
    rows = gs.execute(
        "CALL knn.get(2, 0.0) YIELD node, neighbour, similarity "
        "RETURN count(*) AS n, min(similarity) AS mn").collect()
    assert rows[0].n > 0 and rows[0].mn >= 0.0


def test_bridges_procedure(spark):
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    gs = GraphSession(g)
    rows = gs.execute("CALL bridges.get() YIELD node_from, node_to "
                      "RETURN node_from, node_to").collect()
    assert {tuple(sorted((r.node_from, r.node_to))) for r in rows} == {(3, 4)}
    rows = gs.execute("CALL bipartite_matching.max() "
                      "YIELD maximum_bipartite_matching AS m RETURN m").collect()
    assert rows[0].m == 0  # triangle present -> not bipartite
