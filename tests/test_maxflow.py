"""Max-flow / min-cut (reference src/mage/python/max_flow.py, igraphalg.mincut)."""

from pyspark.sql import functions as F

from memgraph_spark.algos import max_flow, min_cut
from memgraph_spark.catalog import load_tpch_graph
from tests.conftest import SF_SMOKE


def _flow_graph(spark):
    # classic CLRS example: max flow 1->6 = 23
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"PIPE": spark.createDataFrame(
        [(1, 2, 16.0), (1, 3, 13.0), (2, 3, 10.0), (3, 2, 4.0),
         (2, 4, 12.0), (4, 3, 9.0), (3, 5, 14.0), (5, 4, 7.0),
         (4, 6, 20.0), (5, 6, 4.0)],
        "src long, dst long, weight double")}
    g._adj_cache.clear()
    return g


def test_max_flow_value(spark):
    g = _flow_graph(spark)
    total, paths, _ = max_flow(g, 1, 6, "weight")
    assert abs(total - 23.0) < 1e-6
    # every reported path carries positive flow and runs 1 -> 6
    assert all(f > 0 and p[0] == 1 and p[-1] == 6 for p, f in paths)
    assert abs(sum(f for _, f in paths) - 23.0) < 1e-6


def test_max_flow_disconnected(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"PIPE": spark.createDataFrame(
        [(1, 2, 5.0), (3, 4, 5.0)], "src long, dst long, weight double")}
    g._adj_cache.clear()
    total, paths, _ = max_flow(g, 1, 4, "weight")
    assert total == 0.0 and paths == []


def test_min_cut_partitions(spark):
    g = _flow_graph(spark)
    parts = {r.id: r.partition_id for r in min_cut(g, 1, 6, "weight").collect()}
    assert parts[1] == 0 and parts[6] == 1
    # cut capacity across the partition equals the max flow (23)
    e = g.edges["PIPE"]
    pdf = g.spark.createDataFrame(list(parts.items()), "id long, p int")
    cut = (e.join(pdf.withColumnRenamed("p", "ps"), e["src"] == pdf["id"]).drop("id")
           .join(pdf.withColumnRenamed("p", "pd"), F.col("dst") == F.col("id"))
           .filter("ps = 0 and pd = 1")
           .agg(F.sum("weight")).first()[0])
    assert abs(cut - 23.0) < 1e-6


def test_max_flow_procedure(spark):
    from memgraph_spark.plans import GraphSession
    g = _flow_graph(spark)
    gs = GraphSession(g)
    rows = gs.execute(
        "CALL max_flow.get_flow(1, 6, 'weight') YIELD max_flow "
        "RETURN max_flow").collect()
    assert abs(rows[0].max_flow - 23.0) < 1e-6
