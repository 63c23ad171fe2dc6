"""Louvain community detection (reference community_detection /
leiden_community_detection modules)."""

from pyspark.sql import functions as F

from memgraph_spark.algos import louvain_communities
from memgraph_spark.catalog import load_tpch_graph
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE


def _clique(nodes):
    return [(a, b) for a in nodes for b in nodes if a < b]


def test_louvain_two_cliques(spark):
    # two K4s joined by a single bridge: Louvain must find the two cliques
    edges = _clique([1, 2, 3, 4]) + _clique([5, 6, 7, 8]) + [(4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {row.id: row.community for row in louvain_communities(df).collect()}
    assert len(r) == 8
    left = {r[i] for i in (1, 2, 3, 4)}
    right = {r[i] for i in (5, 6, 7, 8)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_louvain_ring_of_cliques(spark):
    # three triangles in a ring: each triangle is one community
    tris = [_clique([1, 2, 3]), _clique([4, 5, 6]), _clique([7, 8, 9])]
    edges = [e for t in tris for e in t] + [(3, 4), (6, 7), (9, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {row.id: row.community for row in louvain_communities(df).collect()}
    groups = [{r[1], r[2], r[3]}, {r[4], r[5], r[6]}, {r[7], r[8], r[9]}]
    assert all(len(g) == 1 for g in groups)
    assert len({next(iter(g)) for g in groups}) == 3


def test_louvain_weighted(spark):
    # weight dominates topology: heavy edges bind 1-2 and 3-4
    edges = [(1, 2, 10.0), (3, 4, 10.0), (2, 3, 0.1)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    r = {row.id: row.community
         for row in louvain_communities(df, weight_col="weight").collect()}
    assert r[1] == r[2] and r[3] == r[4] and r[1] != r[3]


def test_louvain_procedure(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    edges = _clique([1, 2, 3]) + _clique([4, 5, 6]) + [(3, 4)]
    g.edges = {"E": spark.createDataFrame(edges, "src long, dst long")}
    g._adj_cache.clear()
    gs = GraphSession(g)
    rows = gs.execute(
        "CALL community_detection.get() YIELD node, community_id "
        "RETURN count(*) AS n, count(*) - count(*) + "
        "size(collect(DISTINCT community_id)) AS n_comms").collect()
    assert rows[0].n == 6 and rows[0].n_comms == 2
