"""Join-compiled frame-dependent CALL arguments (VERDICT r3 item 3).

Hot graph-lookup built-ins (neighbors.at_hop/by_hop,
node.relationship_types/exists, label.exists) compile to distributed
joins when their arguments reference frame variables — reference
CallProcedure runs per pulled row natively (operator.cpp:8130); these
paths must bypass the PCALL_MAX_COMBOS driver-loop fence entirely."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession


@pytest.fixture(scope="module")
def gs(spark):
    """Path 1-2-3-4 of :E edges, 10-11 of :F edges, labels A (1..4) and
    B (10, 11)."""
    g = PropertyGraph(
        spark,
        nodes={"A": spark.createDataFrame([(i,) for i in (1, 2, 3, 4)],
                                          "id long"),
               "B": spark.createDataFrame([(10,), (11,)], "id long")},
        edges={"E": spark.createDataFrame(
                   [(1, 2), (2, 3), (3, 4)], "src long, dst long"),
               "F": spark.createDataFrame([(10, 11)],
                                          "src long, dst long")})
    return GraphSession(g)


def _force_loop(monkeypatch, *names):
    """Temporarily strip the vectorized handlers so the fenced driver loop
    runs — the two paths must agree."""
    from memgraph_spark import procedures as P
    for n in names:
        monkeypatch.delitem(P.VECTORIZED, n)


def _run(gs, q):
    return sorted(map(tuple, gs.execute(q).collect()))


REL_TYPES_Q = ("UNWIND [1, 2, 10, 11] AS v "
               "CALL node.relationship_types(v) YIELD relationship_types "
               "RETURN v, relationship_types")
REL_EXISTS_Q = ("UNWIND [1, 10] AS v UNWIND [['E'], ['F']] AS t "
                "CALL node.relationship_exists(v, t) YIELD exists AS ex "
                "RETURN v, t[0] AS t0, ex")
AT_HOP_Q = ("UNWIND [1, 2, 10] AS v "
            "CALL neighbors.at_hop(v, null, 2) YIELD nodes "
            "RETURN v, nodes")
BY_HOP_Q = ("UNWIND [1, 10] AS v "
            "CALL neighbors.by_hop(v, null, 3) YIELD nodes "
            "RETURN v, nodes")
LABEL_Q = ("UNWIND [1, 10] AS v UNWIND ['A', 'B'] AS l "
           "CALL label.exists(v, l) YIELD exists AS ex "
           "RETURN v, l, ex")


def test_rel_types_matches_loop(gs, monkeypatch):
    vec = _run(gs, REL_TYPES_Q)
    assert (1, ["E"]) in vec and (10, ["F"]) in vec
    _force_loop(monkeypatch, "node.relationship_types")
    assert _run(gs, REL_TYPES_Q) == vec


def test_rel_exists_matches_loop(gs, monkeypatch):
    vec = _run(gs, REL_EXISTS_Q)
    assert set(vec) == {(1, "E", True), (1, "F", False),
                        (10, "E", False), (10, "F", True)}
    _force_loop(monkeypatch, "node.relationship_exists")
    assert _run(gs, REL_EXISTS_Q) == vec


def test_rel_exists_variant_args_vectorized_only(gs):
    """Heterogeneous-list args compile to VARIANT structs; the vectorized
    path decodes them (the opaque driver loop cannot — pre-existing
    limitation the join-compiled path lifts)."""
    rows = _run(gs, "UNWIND [[1, null], [10, ['E']], [10, ['F']]] AS p "
                    "CALL node.relationship_exists(p[0], p[1]) "
                    "YIELD exists AS ex "
                    "RETURN toInteger(p[0]) AS v, ex")
    assert sorted(rows) == [(1, True), (10, False), (10, True)]


def test_at_hop_matches_loop(gs, monkeypatch):
    vec = _run(gs, AT_HOP_Q)
    # node 1 reaches 3 at exactly 2 hops; node 2 reaches 4; 10 reaches none
    assert vec == [(1, 3), (2, 4)]
    _force_loop(monkeypatch, "neighbors.at_hop")
    assert _run(gs, AT_HOP_Q) == vec


def test_by_hop_matches_loop(gs, monkeypatch):
    vec = _run(gs, BY_HOP_Q)
    assert (1, [2]) in vec and (1, [3]) in vec and (10, [11]) in vec
    _force_loop(monkeypatch, "neighbors.by_hop")
    assert _run(gs, BY_HOP_Q) == vec


def test_label_exists_matches_loop(gs, monkeypatch):
    vec = _run(gs, LABEL_Q)
    assert set(vec) == {(1, "A", True), (1, "B", False),
                        (10, "A", False), (10, "B", True)}
    _force_loop(monkeypatch, "label.exists")
    assert _run(gs, LABEL_Q) == vec


def test_bound_node_variable_argument(gs):
    """A MATCH-bound node variable (compiles to a struct) works as the
    vectorized node argument."""
    rows = _run(gs, "MATCH (n:A) CALL node.relationship_types(n) "
                    "YIELD relationship_types "
                    "RETURN id(n) AS v, relationship_types")
    assert (1, ["E"]) in rows and len(rows) == 4


def test_fence_bypassed_above_1000_combos(spark):
    """>PCALL_MAX_COMBOS distinct per-row arguments: the join-compiled
    path must run green where the driver loop would refuse."""
    n = 1500
    g = PropertyGraph(
        spark,
        nodes={"N": spark.range(n).select(F.col("id"))},
        edges={"E": spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))})
    gs = GraphSession(g)
    rows = gs.execute(
        f"UNWIND range(0, {n - 1}) AS v "
        "CALL node.relationship_exists(v) YIELD exists AS ex "
        "RETURN count(*) AS n, sum(CASE WHEN ex THEN 1 ELSE 0 END) "
        "AS hits").collect()[0]
    assert (rows.n, rows.hits) == (n, n)     # chain: every node touched


def test_opaque_procedure_keeps_fence(spark):
    """Procedures NOT in the vectorized registry still hit the
    PCALL_MAX_COMBOS refusal."""
    from memgraph_spark import procedures as P
    from memgraph_spark.plans.exprs import CompileError
    g = PropertyGraph(spark, nodes={}, edges={})
    gs = GraphSession(g)

    def echo(graph, x):
        return graph.spark.createDataFrame([(int(x),)], "out long")
    P.register("tests.echo_opaque", echo)
    try:
        with pytest.raises(CompileError, match="distinct argument"):
            gs.execute("UNWIND range(0, 1500) AS v "
                       "CALL tests.echo_opaque(v) YIELD out "
                       "RETURN count(*) AS n").collect()
    finally:
        P.unregister("tests.echo_opaque")


def test_opaque_per_row_variant_args(gs):
    """The fenced driver loop now decodes VARIANT args (heterogeneous
    lists) and node structs before invoking the procedure, and rebuilds
    typed literals for the join-back."""
    from memgraph_spark import procedures as P

    def describe(graph, x):
        if isinstance(x, list):
            out = f"list:{len(x)}"
        else:
            out = f"{type(x).__name__}:{x}"
        return graph.spark.createDataFrame([(out,)], "d string")
    P.register("tests.describe", describe)
    try:
        rows = _run(gs, "UNWIND [[1, 'a'], [2, ['x', 'y']]] AS p "
                        "CALL tests.describe(p[1]) YIELD d "
                        "RETURN toInteger(p[0]) AS v, d")
        assert sorted(rows) == [(1, "str:a"), (2, "list:2")]
    finally:
        P.unregister("tests.describe")


def test_opaque_per_row_bound_node_arg(gs):
    """A bound node variable reaches an opaque procedure as its id (the
    int(node) convention)."""
    from memgraph_spark import procedures as P

    def ident(graph, x):
        return graph.spark.createDataFrame([(int(x),)], "nid long")
    P.register("tests.ident", ident)
    try:
        rows = _run(gs, "MATCH (n:B) CALL tests.ident(n) YIELD nid "
                        "RETURN id(n) AS v, nid")
        assert rows == [(10, 10), (11, 11)]
    finally:
        P.unregister("tests.ident")
