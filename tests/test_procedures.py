"""CALL procedure + LOAD clause tests (SURVEY §2.10, §2.1)."""

from __future__ import annotations

import os
import tempfile

import pytest

from memgraph_spark.catalog import graph_for
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def gs(spark):
    return GraphSession(graph_for(spark, SF_SMOKE))


def test_call_pagerank(gs):
    r = gs.execute("CALL pagerank.get() YIELD node, rank "
                   "RETURN count(*) AS n, round(sum(rank), 4) AS total"
                   ).collect()[0]
    assert r.n > 0 and abs(r.total - 1.0) < 1e-3


def test_call_wcc_single_component(gs):
    # the TPC-H graph is fully connected through nation/region spokes
    r = gs.execute("CALL wcc.get() YIELD node_id, component_id "
                   "RETURN count(DISTINCT component_id) AS comps").collect()[0]
    assert r.comps == 1


def test_call_yield_alias_and_pipeline(gs):
    rows = gs.execute(
        "CALL degree_centrality.get() YIELD node AS v, degree AS d "
        "WITH v, d WHERE d > 0 RETURN count(*) AS n").collect()
    assert rows[0].n > 0


def test_call_with_args(gs):
    r = gs.execute("CALL pagerank.get(5, 0.9) YIELD node, rank "
                   "RETURN round(sum(rank), 3) AS total").collect()[0]
    assert abs(r.total - 1.0) < 1e-2


def test_call_unknown_yield_errors(gs):
    from memgraph_spark.plans.exprs import CompileError
    with pytest.raises(CompileError):
        gs.execute("CALL pagerank.get() YIELD nope RETURN nope")


def test_register_custom_procedure(gs, spark):
    from memgraph_spark import procedures

    def my_proc(g, k=3):
        return g.spark.range(int(k)).selectExpr("id AS x")

    procedures.register("my_module.numbers", my_proc)
    rows = gs.execute("CALL my_module.numbers(4) YIELD x "
                      "RETURN sum(x) AS s").collect()
    assert rows[0].s == 6


def test_load_csv(gs):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "people.csv"), "w") as f:
        f.write("name,age\nalice,30\nbob,25\n")
    rows = gs.execute(
        f"LOAD CSV FROM '{d}/people.csv' WITH HEADER AS row "
        "RETURN row.name AS name, row.age AS age ORDER BY name").collect()
    assert [(r.name, r.age) for r in rows] == [("alice", 30), ("bob", 25)]


def test_call_per_row_arguments(gs):
    """CALL args referencing frame variables: the procedure runs once per
    DISTINCT argument combination (fenced) and the yield streams join back
    on those values — reference CallProcedure evaluates args per pull."""
    from memgraph_spark import procedures as P

    def doubler(g, x):
        return g.spark.createDataFrame([(int(x) * 2,)], "out long")
    P.register("tests.doubler", doubler)
    try:
        rows = gs.execute(
            "UNWIND [1, 2, 3, 2] AS v "
            "CALL tests.doubler(v) YIELD out RETURN v, out ORDER BY v"
        ).collect()
        assert [(r.v, r.out) for r in rows] == [(1, 2), (2, 4), (2, 4),
                                                (3, 6)]
    finally:
        P.unregister("tests.doubler")


def test_call_in_query_without_yield_errors(gs):
    """In-query CALL with outputs must YIELD (TCK pins UndefinedVariable at
    the later RETURN; we err at the CALL — same compile-time contract)."""
    with pytest.raises(Exception, match="YIELD|yield"):
        gs.execute("UNWIND [1] AS v CALL pagerank.get() RETURN v").collect()


def test_call_without_yield_rejected_before_side_effects(gs):
    """A non-void procedure called in-query without YIELD must be rejected
    before its side effects run (round-5 advice: the check had moved to
    after the full per-combo loop). Declared-non-void: zero invocations;
    undeclared: at most the single first-combo schema probe."""
    from memgraph_spark import procedures as P
    calls = {"n": 0}

    def effectful(g, x):
        calls["n"] += 1
        return g.spark.createDataFrame([(int(x),)], "out long")

    P.register("tests.effectful", effectful,
               signature={"args": [("x", "int")], "void": False})
    try:
        with pytest.raises(Exception, match="YIELD|yield"):
            gs.execute("UNWIND [1, 2, 3] AS v "
                       "CALL tests.effectful(v) RETURN v").collect()
        assert calls["n"] == 0          # declared non-void: no invocation
    finally:
        P.unregister("tests.effectful")
    P.register("tests.effectful", effectful)   # undeclared signature
    try:
        with pytest.raises(Exception, match="YIELD|yield"):
            gs.execute("UNWIND [1, 2, 3] AS v "
                       "CALL tests.effectful(v) RETURN v").collect()
        assert calls["n"] <= 1          # only the first-combo probe ran
    finally:
        P.unregister("tests.effectful")


def test_load_csv_no_header_delimiter(gs):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "data.csv"), "w") as f:
        f.write("x|1\ny|2\n")
    rows = gs.execute(
        f"LOAD CSV FROM '{d}/data.csv' NO HEADER DELIMITER '|' AS row "
        "RETURN count(*) AS n").collect()
    assert rows[0].n == 2


def test_load_parquet(gs):
    rows = gs.execute(
        f"LOAD PARQUET FROM '{SF_SMOKE}/region.parquet' AS r "
        "RETURN r.r_name AS name ORDER BY name LIMIT 1").collect()
    assert rows[0].name == "AFRICA"


def test_load_jsonl(gs):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "docs.jsonl"), "w") as f:
        f.write('{"id": 1, "txt": "hello"}\n{"id": 2, "txt": "world"}\n')
    rows = gs.execute(
        f"LOAD JSONL FROM '{d}/docs.jsonl' AS doc "
        "RETURN doc.id AS id, doc.txt AS txt ORDER BY id").collect()
    assert [(r.id, r.txt) for r in rows] == [(1, "hello"), (2, "world")]


def test_call_per_row_empty_frame_coercing_proc(gs):
    """ADVICE r3: a row-dependent CALL over an EMPTY frame must return zero
    rows even when the procedure coerces its args (int(x) would TypeError
    on the old None-args schema probe)."""
    from memgraph_spark import procedures as P

    def coercer(g, x):
        return g.spark.createDataFrame([(int(x) * 2,)], "out long")
    P.register("tests.coercer", coercer)
    try:
        rows = gs.execute(
            "UNWIND [1, 2] AS v WITH v WHERE v > 99 "
            "CALL tests.coercer(v) YIELD out RETURN v, out").collect()
        assert rows == []
    finally:
        P.unregister("tests.coercer")


def test_call_compile_error_in_body_propagates(gs):
    """ADVICE r3: a CompileError raised INSIDE a procedure body must
    propagate, not silently reroute the CALL into per-row mode (which
    re-invokes the procedure and surfaces a misleading no-vars error)."""
    from memgraph_spark import procedures as P
    from memgraph_spark.plans.exprs import CompileError

    calls = {"n": 0}

    def exploder(g):
        calls["n"] += 1
        raise CompileError("boom from procedure body")
    P.register("tests.exploder", exploder)
    try:
        with pytest.raises(CompileError, match="boom from procedure body"):
            gs.execute("CALL tests.exploder() YIELD x RETURN x")
        assert calls["n"] == 1          # invoked once, never re-invoked
    finally:
        P.unregister("tests.exploder")


def test_call_yield_star_shadow_errors(gs):
    """ADVICE r3: YIELD * gets the same VariableAlreadyBound shadow check
    as an explicit YIELD list."""
    from memgraph_spark import procedures as P

    def named(g):
        return g.spark.createDataFrame([(1,)], "v long")
    P.register("tests.named_out", named)
    try:
        with pytest.raises(Exception, match="VariableAlreadyBound"):
            gs.execute("UNWIND [1] AS v "
                       "CALL tests.named_out() YIELD * RETURN v").collect()
    finally:
        P.unregister("tests.named_out")
