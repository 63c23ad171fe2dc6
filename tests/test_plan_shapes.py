"""Physical-plan shape assertions — the 100 TB story, pinned as tests.

SCALE.md claims specific execution properties (predicate pushdown into the
parquet scans, column pruning, broadcast joins for dimension tables, top-k
fused to TakeOrderedAndProject, whole-stage codegen in the hot path). These
tests read the actual plans so a regression in any of them fails CI instead
of silently costing 100x at scale. AQE-final plans are inspected AFTER an
action so the adaptive re-planning has happened.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from memgraph_spark import queries as Q
from tests.conftest import SF_SMOKE


def _final_plan(df) -> str:
    """Executed (AQE-final) physical plan string. collect() (not count())
    so the DataFrame's OWN QueryExecution runs and AQE finalizes it."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_and_topk_fusion(spark):
    """Property predicate reaches the parquet scan; ORDER BY+LIMIT fuses
    to TakeOrderedAndProject (no global sort)."""
    df = Q.QUERIES["scan_filter_orderby"](spark, SF_SMOKE)
    plan = _formatted(df)
    assert "PushedFilters" in plan and "IsNotNull" in plan
    # at least one non-trivial pushed filter beyond the null check
    assert any(tok in plan for tok in
               ("GreaterThan", "LessThan", "EqualTo", "StringStartsWith")), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan  # no standalone global sort operator


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection over lineitem must not read all 16 columns."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    plan = _formatted(df)
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_returnflag" in scan and "l_quantity" in scan
    assert "l_comment" not in scan and "l_shipdate" not in scan, scan


def test_dimension_join_broadcasts(spark):
    """Region/nation dimension joins pick BroadcastHashJoin under AQE."""
    df = Q.QUERIES["region_revenue"](spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_hot_path_is_codegen_no_python_udf(spark):
    """The aggregation hot path stays inside whole-stage codegen; no
    row-at-a-time Python eval operators appear in headline query plans."""
    for name in ("region_revenue", "groupby_having", "events_window"):
        plan = _final_plan(Q.QUERIES[name](spark, SF_SMOKE))
        # codegen'd operators carry the `*(N)` stage prefix in the final plan
        assert "*(" in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_node_prop_map_is_not_whole_graph_broadcast(spark):
    """Endpoint-property dereference of edge VALUES (startNode(x).prop for a
    list element) must build its lookup map per row via explode + equi-join,
    NOT collect the whole node table into one broadcast map row: no
    BroadcastNestedLoopJoin / CartesianProduct, and every collect_list in
    the plan is grouped (partial aggregate), never a global single-row agg."""
    from memgraph_spark.catalog import PropertyGraph
    from memgraph_spark.plans import GraphSession
    gs = GraphSession(PropertyGraph(spark, nodes={}, edges={}))
    gs.execute("CREATE (:L {name:'ana'})-[:R]->(:L {name:'bob'})").collect()
    df = gs.execute(
        "MATCH p=(a)-[]->(b) "
        "RETURN [x IN relationships(p) | startNode(x).name] AS names")
    assert [r["names"] for r in df.collect()] == [["ana"]]
    plan = _final_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # a whole-table map shows up as a global (no-grouping-key) aggregate
    # feeding a broadcast; grouped collect_list lines carry the rid key
    for line in plan.splitlines():
        if "collect_list" in line and "HashAggregate" in line:
            assert "keys=[]" not in line, line


def test_expand_hop_is_single_equijoin(spark):
    """One MATCH hop compiles to ONE join, not a cross product + filter."""
    df = Q.QUERIES["expand_one_hop"](spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
