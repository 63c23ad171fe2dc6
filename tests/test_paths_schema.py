"""K-shortest / all-shortest-path-count operators + schema/dump/constraints
(SURVEY §2.3, §1, §2.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import graph_for, load_tpch_graph
from memgraph_spark.operators import (
    bfs_path_counts,
    k_shortest_paths,
    shortest_path_with_nodes,
)
from memgraph_spark.schema import ConstraintSet, dump_database, schema_info
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def diamond(spark):
    """1->2->4 (cost 1+1), 1->3->4 (cost 1+3), 1->4 (cost 5)."""
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(
        [(1, 2, 1.0), (2, 4, 1.0), (1, 3, 1.0), (3, 4, 3.0), (1, 4, 5.0)],
        "src long, dst long, w double")
        .withColumn("eid", F.xxhash64("src", "dst"))}
    g._adj_cache.clear()
    return g


def test_shortest_path_with_nodes(diamond):
    path, cost = shortest_path_with_nodes(diamond, 1, 4, etype="E",
                                          weight_col="w")
    assert path == [1, 2, 4] and cost == 2.0


def test_k_shortest_paths_yen(diamond):
    paths = k_shortest_paths(diamond, 1, 4, k=3, etype="E", weight_col="w")
    assert [(p, c) for p, c in paths] == [
        ([1, 2, 4], 2.0), ([1, 3, 4], 4.0), ([1, 4], 5.0)]


def test_bfs_path_counts(spark, diamond):
    sources = spark.createDataFrame([(1,)], "id long")
    rows = {(r.id, r.dist): r.n_paths
            for r in bfs_path_counts(diamond, sources, etype="E").collect()}
    # node 4 is reachable at dist 1 (direct edge) -> one minimal path
    assert rows[(4, 1)] == 1
    assert rows[(2, 1)] == 1 and rows[(3, 1)] == 1


def test_bfs_path_counts_multiplicity(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long")
        .withColumn("eid", F.xxhash64("src", "dst"))}
    g._adj_cache.clear()
    sources = spark.createDataFrame([(1,)], "id long")
    rows = {(r.id, r.dist): r.n_paths
            for r in bfs_path_counts(g, sources, etype="E").collect()}
    assert rows[(4, 2)] == 2  # two minimal 2-hop paths


def test_betweenness_path_graph(spark):
    from memgraph_spark.algos import betweenness_centrality
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long")
        .withColumn("eid", F.xxhash64("src", "dst"))}
    g._adj_cache.clear()
    b = {r.id: r.betweenness
         for r in betweenness_centrality(g, etype="E").collect()}
    # directed path 1->2->3->4: node 2 lies on (1,3),(1,4); node 3 on (1,4),(2,4)
    assert b[2] == 2.0 and b[3] == 2.0 and b.get(4, 0.0) == 0.0


def test_betweenness_split_paths(spark):
    from memgraph_spark.algos import betweenness_centrality
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long")
        .withColumn("eid", F.xxhash64("src", "dst"))}
    g._adj_cache.clear()
    b = {r.id: r.betweenness
         for r in betweenness_centrality(g, etype="E").collect()}
    # two equal-length 1->4 paths: each mid node carries half the dependency
    assert b[2] == 0.5 and b[3] == 0.5


def test_betweenness_fence_samples_past_threshold(spark, monkeypatch):
    """Above BETWEENNESS_EXACT_MAX vertices the default switches to the
    sampled (V/k-scaled) estimator; exact=True opts back into all-sources
    Brandes. On a symmetric star both must agree exactly when the sample
    covers a representative source set."""
    import memgraph_spark.algos.betweenness as bw
    g = load_tpch_graph(spark, SF_SMOKE)
    # star: 1..8 -> 0 -> 11..18 ; center 0 lies on all 64 cross pairs
    spokes = [(i, 0) for i in range(1, 9)] + [(0, 10 + i) for i in range(1, 9)]
    g.edges = {"E": spark.createDataFrame(spokes, "src long, dst long")
               .withColumn("eid", F.xxhash64("src", "dst"))}
    g._adj_cache.clear()
    exact = {r.id: r.betweenness
             for r in bw.betweenness_centrality(g, etype="E",
                                                exact=True).collect()}
    assert exact[0] == 64.0
    monkeypatch.setattr(bw, "BETWEENNESS_EXACT_MAX", 4)
    # sample of 8: in-spokes are the only sources with outgoing paths, and
    # any 8-subset scaled by 17/8 ... so instead sample ALL 17 (k >= n):
    # scale V/k = 1 and the estimate is exact
    approx = {r.id: r.betweenness
              for r in bw.betweenness_centrality(
                  g, etype="E", sample_size=17).collect()}
    assert approx[0] == 64.0
    # smaller sample still runs (a hash-picked all-sink sample may yield no
    # dependencies — empty is a legal estimate, raising is not)
    small = bw.betweenness_centrality(g, etype="E", sample_size=4)
    assert set(small.columns) == {"id", "betweenness"}
    small.count()


def test_betweenness_procedure(spark):
    from memgraph_spark.catalog import graph_for
    from memgraph_spark.plans import GraphSession
    gs = GraphSession(graph_for(spark, SF_SMOKE))
    rows = gs.execute(
        "CALL betweenness_centrality.get(20) YIELD node, betweenness "
        "RETURN count(*) AS n, max(betweenness) AS mx").collect()
    assert rows[0].n > 0 and rows[0].mx >= 0.0


def test_schema_info(spark):
    g = graph_for(spark, SF_SMOKE)
    info = schema_info(g)
    rows = {(r.kind, r.name, r.property): r.type for r in info.collect()}
    assert rows[("node", "Customer", "acctbal")] == "double"
    assert ("edge", "CONTAINS", "quantity") in rows


def test_dump_database_roundtrippable_statements(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    from memgraph_spark.plans import GraphSession
    gs = GraphSession(g)
    gs.execute("CREATE (:Tiny {name: 'x'})-[:R {w: 1}]->(:Tiny {name: 'y'})"
               ).collect()
    stmts = list(dump_database(g))
    assert any(s.startswith("CREATE (:Tiny") and "name: 'x'" in s
               for s in stmts)
    assert any("CREATE (a)-[:R" in s for s in stmts)
    # every statement parses with our own frontend
    from memgraph_spark.plans.parser import parse
    for s in stmts[:20]:
        parse(s.rstrip(";"))


def test_constraints(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    cs = ConstraintSet(g)
    cs.create_existence("Customer", "name")
    cs.create_unique("Customer", "key")
    assert all(v == 0 for v in cs.validate().values())
    cs.create_unique("Customer", "mktsegment")  # 150 customers, 5 segments
    assert cs.validate()["unique(Customer.mktsegment)"] > 0
