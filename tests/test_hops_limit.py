"""USING HOPS LIMIT (MemgraphCypher.g4:413, src/query/hops_limit.hpp)."""

from memgraph_spark.catalog import load_tpch_graph
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE


def _chain_session(spark, n=8):
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long")}
    g.nodes = {"N": spark.createDataFrame(
        [(i,) for i in range(1, n + 1)], "id long")}
    g._adj_cache.clear()
    return GraphSession(g)


def test_hops_limit_truncates_expansion(spark):
    gs = _chain_session(spark)
    full = gs.execute("MATCH (a:N)-[:E*1..10]->(b) WHERE id(a) = 1 "
                      "RETURN count(*) AS n").collect()[0].n
    assert full == 7  # chain of 8 nodes: 7 reachable path lengths
    limited = gs.execute("USING HOPS LIMIT 3 MATCH (a:N)-[:E*1..10]->(b) WHERE id(a) = 1 "
                         "RETURN count(*) AS n").collect()[0].n
    assert limited < full  # partial results once the quota is exhausted
    assert gs.last_hops["reached"] is True
    assert gs.last_hops["used"] >= 3


def test_hops_limit_not_reached(spark):
    gs = _chain_session(spark)
    n = gs.execute("USING HOPS LIMIT 1000 MATCH (a:N)-[:E*1..10]->(b) WHERE id(a) = 1 "
                   "RETURN count(*) AS n").collect()[0].n
    assert n == 7
    assert gs.last_hops["reached"] is False and 0 < gs.last_hops["used"] <= 1000


def test_hops_limit_metered_above_replay_fence(spark, monkeypatch):
    """Above HOPS_SIM_MAX_EDGES the exact driver-side replay is skipped,
    but the distributed fallback must still METER the quota: partial
    results (possibly coarser truncation), used/reached accounting intact —
    never quota-ignoring full results."""
    import memgraph_spark.plans.traversal as TR
    monkeypatch.setattr(TR, "HOPS_SIM_MAX_EDGES", 0)  # force the fallback
    gs = _chain_session(spark)
    q = ("USING HOPS LIMIT 3 MATCH (a:N)-[:E*1..10]->(b) "
         "WHERE id(a) = 1 RETURN count(*) AS n")
    limited = gs.execute(q).collect()[0].n
    assert limited < 7  # quota enforced, not ignored
    assert gs.last_hops["reached"] is True
    assert 0 < gs.last_hops["used"] <= 3
    # a quota that covers everything passes through untruncated
    n = gs.execute("USING HOPS LIMIT 1000 MATCH (a:N)-[:E*1..10]->(b) "
                   "WHERE id(a) = 1 RETURN count(*) AS n").collect()[0].n
    assert n == 7 and gs.last_hops["reached"] is False


def test_using_directives_parse(spark):
    """preQueryDirectives (MemgraphCypher.g4:409-423): INDEX hints and
    PARALLEL EXECUTION parse as advisory no-ops; HOPS LIMIT still binds."""
    from memgraph_spark.catalog import load_tpch_graph
    from memgraph_spark.plans import GraphSession
    from memgraph_spark.plans.parser import Parser
    from tests.conftest import SF_SMOKE

    q = Parser("USING HOPS LIMIT 5, INDEX :Part(size), :Customer(acctbal), "
               "PARALLEL EXECUTION 4 MATCH (p:Part) RETURN p").parse()
    assert q.hops_limit == 5
    assert q.index_hints == [("Part", ("size",)), ("Customer", ("acctbal",))]

    gs = GraphSession(load_tpch_graph(spark, SF_SMOKE))
    [row] = gs.execute(
        "USING INDEX :Part(size) MATCH (p:Part) WHERE p.size > 40 "
        "RETURN count(*) AS n").collect()
    assert row["n"] > 0
