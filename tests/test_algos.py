"""Unit tests for the algorithm library on tiny hand-built graphs (the
reference's gtest style: construct mini-graph, assert exact results —
tests/unit/query_plan_* pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.algos import (
    degree_centrality,
    label_propagation,
    node_similarity_jaccard,
    pagerank,
    triangle_count,
    weakly_connected_components,
)


@pytest.fixture(scope="module")
def tiny_edges(spark):
    # two components: a 4-cycle with a chord (triangle) and a 2-path
    rows = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (10, 11), (11, 12)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_wcc(spark, tiny_edges):
    comp = {r["id"]: r["component"]
            for r in weakly_connected_components(tiny_edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10


def test_pagerank_sums_to_one(spark, tiny_edges):
    ranks = pagerank(tiny_edges, max_iter=15)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6
    r = {row["id"]: row["rank"] for row in ranks.collect()}
    # vertex 3 has in-edges from 1,2; vertex 12 is a sink of a chain
    assert r[3] > r[4]


def test_triangle_count(spark, tiny_edges):
    # triangles: (1,2,3) and (1,3,4)
    assert triangle_count(tiny_edges).first()["n_triangles"] == 2


def test_degree_centrality(spark, tiny_edges):
    deg = {r["id"]: r["degree"] for r in degree_centrality(tiny_edges).collect()}
    assert deg[1] == 3 and deg[3] == 3 and deg[11] == 2


def test_node_similarity(spark):
    edges = [(1, 100), (1, 101), (2, 100), (2, 101), (3, 101), (3, 102)]
    df = node_similarity_jaccard(
        pytest.importorskip("pyspark").sql.SparkSession.getActiveSession()
        .createDataFrame(edges, "src long, dst long"))
    sims = {(r["v_a"], r["v_b"]): r["jaccard"] for r in df.collect()}
    assert sims[(1, 2)] == 1.0
    assert sims[(1, 3)] == pytest.approx(1 / 3, abs=1e-4)


def test_label_propagation_components_agree(spark, tiny_edges):
    lab = {r["id"]: r["label"] for r in label_propagation(tiny_edges).collect()}
    # labels never cross the component boundary
    assert len({lab[1], lab[2], lab[3], lab[4]} & {lab[10], lab[11], lab[12]}) == 0


def test_adjacency_vertices_invalidated_on_edge_write(spark):
    """Edge writes must invalidate the cached adjacency endpoint set — a
    stale set made contains_cycle report false positives after a write
    (set_edge_version's filter is `key[0] in (etype, None)`, so the vertex
    cache key must lead with etype)."""
    from memgraph_spark.algos.dag import contains_cycle, topological_layers
    from memgraph_spark.catalog import PropertyGraph
    g = PropertyGraph(spark)
    g.set_node_version("N", spark.createDataFrame(
        [(1,), (2,)], "id long"))
    g.set_edge_version("E", spark.createDataFrame(
        [(1, 1, 2)], "eid long, src long, dst long"))
    assert contains_cycle(g, "E") is False
    got = {r["id"]: r["layer"] for r in topological_layers(g, "E").collect()}
    assert got == {1: 0, 2: 1}
    # write a new edge from a brand-new node; the vertex set must refresh
    g.set_node_version("N", g.nodes["N"].unionByName(
        spark.createDataFrame([(3,)], "id long")))
    g.set_edge_version("E", g.edges["E"].unionByName(
        spark.createDataFrame([(2, 3, 1)], "eid long, src long, dst long")))
    assert contains_cycle(g, "E") is False
    got = {r["id"]: r["layer"] for r in topological_layers(g, "E").collect()}
    assert got == {3: 0, 1: 1, 2: 2}


def test_topological_layers_empty_graph(spark):
    """No edges -> empty (id, layer) frame, not an IndexError."""
    from memgraph_spark.algos.dag import topological_layers
    from memgraph_spark.catalog import PropertyGraph
    g = PropertyGraph(spark)
    g.set_node_version("N", spark.createDataFrame([(1,)], "id long"))
    g.set_edge_version("E", spark.createDataFrame(
        [], "eid long, src long, dst long"))
    out = topological_layers(g, "E")
    assert out is not None and out.count() == 0
