"""Biconnected components + VRP (reference biconnected_components_module,
vrp.py)."""

from memgraph_spark.algos.biconnected import biconnected_components, vrp_route
from memgraph_spark.catalog import load_tpch_graph
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE


def _graph(spark, edges):
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(edges, "src long, dst long")}
    g._adj_cache.clear()
    return g


def test_bcc_two_triangles_and_bridge(spark):
    # triangles {1,2,3} and {4,5,6} joined by bridge 3-4: 3 BCCs
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)])
    rows = biconnected_components(g).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.bcc_id, set()).add(
            tuple(sorted((r.node_from, r.node_to))))
    comps = sorted(by_comp.values(), key=len)
    assert len(comps) == 3
    assert comps[0] == {(3, 4)}  # the bridge is its own BCC
    assert {frozenset(c) for c in comps[1:]} == {
        frozenset({(1, 2), (2, 3), (1, 3)}),
        frozenset({(4, 5), (5, 6), (4, 6)})}


def test_bcc_single_cycle(spark):
    g = _graph(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    rows = biconnected_components(g).collect()
    assert len({r.bcc_id for r in rows}) == 1 and len(rows) == 4


def test_vrp_two_vehicles(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    # depot at origin, two clusters east and west
    pts = [(0, 0.0, 0.0), (1, 0.1, 1.0), (2, -0.1, 1.1),
           (3, 0.1, -1.0), (4, -0.1, -1.1)]
    g.nodes = {"Place": spark.createDataFrame(pts, "id long, lat double, lng double")}
    legs_from, legs_to = vrp_route(g, 0, 2)
    legs = list(zip(legs_from, legs_to))
    # every route starts and ends at the depot; all points visited once
    starts = [b for a, b in legs if a == 0]
    ends = [a for a, b in legs if b == 0]
    assert len(starts) == 2 and len(ends) == 2
    visited = [x for x in legs_from if x != 0]
    assert sorted(visited) == [1, 2, 3, 4]


def test_bcc_procedure(spark):
    g = _graph(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    gs = GraphSession(g)
    rows = gs.execute("CALL biconnected_components.get() "
                      "YIELD bcc_id, node_from, node_to "
                      "RETURN count(*) AS n, size(collect(DISTINCT bcc_id)) AS c"
                      ).collect()
    assert rows[0].n == 4 and rows[0].c == 2
