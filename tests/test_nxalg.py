"""nxalg.* module parity (reference query_modules/nxalg.py): driver-side
networkx over the materialized graph, size-guarded; yields are node/edge
ids. A hand-built graph with known structure drives the assertions."""

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.procedures import PROCEDURES


def _graph(spark, edges, nodes=None, schema="src long, dst long, eid long"):
    node_ids = nodes
    if node_ids is None:
        node_ids = sorted({e[0] for e in edges} | {e[1] for e in edges})
    return PropertyGraph(
        spark,
        nodes={"N": spark.createDataFrame([(i,) for i in node_ids],
                                          "id long")},
        edges={"E": spark.createDataFrame(edges, schema)},
    )


def _call(name, g, *args):
    return PROCEDURES[name](g, *args)


@pytest.fixture
def diamond(spark):
    # 1 -> 2 -> 4, 1 -> 3 -> 4, 4 -> 5   (DAG, eids = 10..14)
    return _graph(spark, [(1, 2, 10), (2, 4, 11), (1, 3, 12), (3, 4, 13),
                          (4, 5, 14)])


def test_topological_sort_and_dag_facts(diamond):
    [row] = _call("nxalg.topological_sort", diamond).collect()
    order = row["nodes"]
    pos = {n: i for i, n in enumerate(order)}
    assert pos[1] < pos[2] < pos[4] < pos[5] and pos[1] < pos[3] < pos[4]
    assert _call("nxalg.ancestors", diamond, 4).collect()[0][
        "ancestors"] == [1, 2, 3]
    assert _call("nxalg.descendants", diamond, 1).collect()[0][
        "descendants"] == [2, 3, 4, 5]
    assert _call("nxalg.is_tree", diamond).collect()[0]["is_tree"] is False
    assert _call("nxalg.is_forest", diamond).collect()[0][
        "is_forest"] is False


def test_cycle_detection(spark, diamond):
    assert _call("nxalg.find_cycle", diamond).collect()[0]["cycle"] is None
    tri = _graph(spark, [(1, 2, 1), (2, 3, 2), (3, 1, 3)])
    cyc = _call("nxalg.find_cycle", tri).collect()[0]["cycle"]
    assert sorted(cyc) == [1, 2, 3]
    [row] = _call("nxalg.simple_cycles", tri).collect()
    assert row["cycles"] == [[1, 2, 3]]


def test_shortest_paths(diamond):
    rows = _call("nxalg.shortest_path", diamond, 1, 5).collect()
    assert len(rows) == 1 and rows[0]["path"][0] == 1 \
        and rows[0]["path"][-1] == 5 and len(rows[0]["path"]) == 4
    rows = _call("nxalg.shortest_path_length", diamond, 1, None).collect()
    lengths = {r["target"]: r["length"] for r in rows}
    assert lengths == {1: 0.0, 2: 1.0, 3: 1.0, 4: 2.0, 5: 3.0}
    [row] = _call("nxalg.all_shortest_paths", diamond, 1, 4).collect()
    assert row["paths"] == [[1, 2, 4], [1, 3, 4]]
    assert _call("nxalg.has_path", diamond, 1, 5).collect()[0][
        "has_path"] is True
    assert _call("nxalg.has_path", diamond, 5, 1).collect()[0][
        "has_path"] is False


def test_weighted_shortest_path(spark):
    g = _graph(spark, [(1, 2, 1, 1.0), (2, 3, 2, 1.0), (1, 3, 3, 5.0)],
               schema="src long, dst long, eid long, w double")
    rows = _call("nxalg.shortest_path", g, 1, 3, "w").collect()
    assert rows[0]["path"] == [1, 2, 3]
    rows = _call("nxalg.multi_source_dijkstra_path_length",
                 g, [1], None, "w").collect()
    assert {r["target"]: r["length"] for r in rows} == \
        {1: 0.0, 2: 1.0, 3: 2.0}


def test_components_and_structure(spark):
    # two triangles joined by a bridge (5 <-> both directions for SCC)
    g = _graph(spark, [(1, 2, 1), (2, 3, 2), (3, 1, 3),
                       (4, 5, 4), (5, 6, 5), (6, 4, 6), (3, 4, 7)])
    [row] = _call("nxalg.strongly_connected_components", g).collect()
    assert row["components"] == [[1, 2, 3], [4, 5, 6]]
    [row] = _call("nxalg.bridges", g).collect()
    assert row["bridges"] == [7]
    [row] = _call("nxalg.biconnected_components", g).collect()
    assert [1, 2, 3] in row["components"] and [4, 5, 6] in row["components"]
    [row] = _call("nxalg.weakly_connected_components_subgraph",
                  g, [1, 2, 3, 4], [1, 2, 3]).collect()
    assert row["n_components"] == 2  # triangle {1,2,3} + isolate {4}


def test_pernode_measures(spark):
    g = _graph(spark, [(1, 2, 1), (2, 3, 2), (3, 1, 3), (3, 4, 4)])
    rows = _call("nxalg.clustering", g).collect()
    cl = {r["node"]: r["clustering"] for r in rows}
    assert cl[1] == 1.0 and cl[4] == 0.0
    rows = _call("nxalg.greedy_color", g).collect()
    colors = {r["node"]: r["color"] for r in rows}
    assert colors[1] != colors[2] and colors[2] != colors[3]
    rows = _call("nxalg.core_number", g).collect()
    cores = {r["node"]: r["core"] for r in rows}
    assert cores[1] == 2 and cores[4] == 1
    rows = _call("nxalg.betweenness_centrality", g).collect()
    bc = {r["node"]: r["betweenness"] for r in rows}
    assert bc[3] > bc[4]


def test_pagerank_and_links(spark):
    g = _graph(spark, [(1, 3, 1), (2, 3, 2), (3, 4, 3)])
    rows = _call("nxalg.pagerank", g).collect()
    pr = {r["node"]: r["rank"] for r in rows}
    assert pr[4] > pr[1] and abs(sum(pr.values()) - 1.0) < 1e-6
    rows = _call("nxalg.jaccard_coefficient", g, [[1, 2]]).collect()
    assert rows[0]["coef"] == 1.0  # both neighbor sets are exactly {3}


def test_traversals(diamond):
    [row] = _call("nxalg.bfs_tree", diamond, 1).collect()
    assert row["tree"] == [1, 2, 3, 4, 5]
    [row] = _call("nxalg.dfs_preorder_nodes", diamond, 1).collect()
    assert row["nodes"][0] == 1 and set(row["nodes"]) == {1, 2, 3, 4, 5}
    rows = _call("nxalg.bfs_successors", diamond, 1).collect()
    succ = {r["node"]: r["successors"] for r in rows}
    assert succ[1] == [2, 3] and succ[4] == [5]
    [row] = _call("nxalg.bfs_edges", diamond, 1).collect()
    assert set(row["edges"]) <= {10, 11, 12, 13, 14} \
        and len(row["edges"]) == 4
    [row] = _call("nxalg.edge_dfs", diamond, 1).collect()
    assert len(row["edges"]) == 5  # every edge exactly once


def test_global_measures(spark):
    # directed 4-cycle (the reference computes diameter on the directed
    # view, nxalg.py:286): longest directed distance = 3
    g = _graph(spark, [(1, 2, 1), (2, 3, 2), (3, 4, 3), (4, 1, 4)])
    assert _call("nxalg.diameter", g).collect()[0]["diameter"] == 3
    assert _call("nxalg.center", g).collect()[0]["center"] == [1, 2, 3, 4]
    assert _call("nxalg.is_bipartite", g).collect()[0][
        "is_bipartite"] is True
    assert _call("nxalg.is_eulerian", g).collect()[0]["is_eulerian"] is True
    [row] = _call("nxalg.wiener_index", g).collect()
    assert row["wiener_index"] > 0
    [row] = _call("nxalg.triadic_census", g).collect()[:1]
    assert row["count"] >= 0


def test_mst_and_matching(spark):
    g = _graph(spark, [(1, 2, 1, 1.0), (2, 3, 2, 1.0), (1, 3, 3, 9.0)],
               schema="src long, dst long, eid long, weight double")
    [row] = _call("nxalg.minimum_spanning_tree", g).collect()
    assert row["nodes"] == [1, 2, 3] and row["edges"] == [1, 2]
    [row] = _call("nxalg.maximal_matching", g).collect()
    assert len(row["edges"]) >= 1
    [row] = _call("nxalg.find_cliques", g).collect()
    assert [1, 2, 3] in row["cliques"]


def test_isolates_and_guards(spark):
    g = _graph(spark, [(1, 2, 1)], nodes=[1, 2, 3])
    [row] = _call("nxalg.isolates", g).collect()
    assert row["isolates"] == [3]
    assert _call("nxalg.is_isolate", g, 3).collect()[0]["is_isolate"] is True
    assert _call("nxalg.is_isolate", g, 1).collect()[0][
        "is_isolate"] is False


def test_size_guard(spark, monkeypatch):
    from memgraph_spark.algos import nxalg_module
    monkeypatch.setattr(nxalg_module, "_MAX_ELEMENTS", 2)
    g = _graph(spark, [(1, 2, 1), (2, 3, 2), (3, 4, 3)])
    with pytest.raises(RuntimeError, match="NXALG_MAX_ELEMENTS"):
        _call("nxalg.topological_sort", g)
