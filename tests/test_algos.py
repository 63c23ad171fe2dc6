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
