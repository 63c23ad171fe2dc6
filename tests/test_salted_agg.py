"""Salted two-phase collect aggregation (VERDICT r4 item 8 / SCALE.md's
dst-hot-key shape): equivalence with the plain plan, and the measured
degree-hint trigger routing pattern comprehensions through it."""

from __future__ import annotations

from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.operators.aggregate import (
    rollup_collect, salted_collect_list)
from memgraph_spark.plans import GraphSession


def test_salted_equals_plain(spark):
    df = spark.range(10_000).select(
        (F.pmod(F.col("id"), 7)).alias("dst"),
        F.col("id").alias("payload"))
    plain = {r.dst: sorted(r.vals) for r in
             df.groupBy("dst").agg(F.collect_list("payload").alias("vals"))
             .collect()}
    salted = {r.dst: sorted(r.vals) for r in
              salted_collect_list(df, ["dst"], "payload", "vals").collect()}
    assert salted == plain


def test_salted_handles_hot_key(spark):
    # one key holds 90% of rows; results must still match exactly
    df = spark.range(50_000).select(
        F.when(F.col("id") < 45_000, F.lit(0))
        .otherwise(F.pmod(F.col("id"), 100) + 1).alias("dst"),
        F.col("id").alias("payload"))
    plain = df.groupBy("dst").agg(
        F.sum("payload").alias("s"), F.count("*").alias("n"))
    salted = salted_collect_list(df, ["dst"], "payload", "vals").select(
        "dst", F.aggregate("vals", F.lit(0).cast("long"),
                           lambda a, x: a + x).alias("s"),
        F.size("vals").cast("long").alias("n"))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def _graph(spark):
    return PropertyGraph(
        spark,
        nodes={"V": spark.createDataFrame(
            [(i,) for i in range(6)], "id long")},
        edges={"E": spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "src long, dst long")})


def test_rollup_routes_on_degree_hint(spark):
    """Without a hint the single-shuffle plan runs; with a measured hint
    whose max degree fills a partition share, the salted plan runs. Both
    produce the same lists."""
    g = _graph(spark)
    df = g.edges["E"].select(F.col("src").alias("k"),
                             F.col("dst").alias("v"))
    cold = rollup_collect(g, df, ["k"], "v", "out")
    assert "flatten" not in cold._jdf.queryExecution().analyzed().toString()
    g.degree_hint[None] = (5_000_000, 5_000_000)   # hot: max == total
    hot = rollup_collect(g, df, ["k"], "v", "out")
    assert "flatten" in hot._jdf.queryExecution().analyzed().toString()
    a = {r.k: sorted(r.out) for r in cold.collect()}
    b = {r.k: sorted(r.out) for r in hot.collect()}
    assert a == b == {0: [1, 2, 3, 4, 5]}


def test_pattern_comprehension_same_under_hint(spark):
    """The Cypher pattern-comprehension path produces identical (sorted)
    lists whether or not the degree hint routes it through the salted
    plan."""
    q = ("MATCH (n:V) WHERE id(n) = 0 "
         "RETURN [(n)-->(m) | id(m)] AS ms")
    g = _graph(spark)
    gs = GraphSession(g)
    plain = sorted(gs.execute(q).collect()[0].ms)
    g2 = _graph(spark)
    g2.degree_hint[None] = (10_000_000, 10_000_000)
    salted = sorted(GraphSession(g2).execute(q).collect()[0].ms)
    assert plain == salted == [1, 2, 3, 4, 5]


def test_analyze_graph_populates_hint(spark):
    g = _graph(spark)
    assert g.degree_hint == {}
    gs = GraphSession(g)
    gs.execute("ANALYZE GRAPH").collect()
    assert g.degree_hint.get(None) == (5, 10)   # supernode 0: deg 5; 2|E|=10


def test_edge_write_invalidates_hint(spark):
    g = _graph(spark)
    g.measure_degree_hint(None)
    assert g.degree_hint[None] == (5, 10)
    g.set_edge_version("E", g.edges["E"].limit(2), ids_allocated=True)
    assert None not in g.degree_hint
