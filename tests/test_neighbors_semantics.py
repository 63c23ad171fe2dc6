"""neighbors.at_hop / by_hop rel_types semantics (VERDICT r4 item 1).

Reference DetermineDirection
(src/mage/cpp/neighbors_module/algorithm/neighbors.cpp:26-48): rel_types
is a LIST unioned across entries; `<T` = T incoming only, `T>` = T
outgoing only, bare `T` = both, `""` (or empty list) = any type, `<T>`
raises. Both the scalar handlers and the join-compiled vectorized paths
must honor the full list — round 4 shipped `rel_types[0]`-only in all
four, so vec==loop equivalence was vacuous; these tests pin the expected
sets by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession


@pytest.fixture(scope="module")
def gs(spark):
    """Star around node 1 with typed, directed spokes plus 2-hop tails:

        3 -E-> 1 -E-> 2 -E-> 7
        5 -F-> 1 -F-> 4 -F-> 8
    """
    g = PropertyGraph(
        spark,
        nodes={"N": spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 4, 5, 7, 8)], "id long")},
        edges={"E": spark.createDataFrame(
                   [(3, 1), (1, 2), (2, 7)], "src long, dst long"),
               "F": spark.createDataFrame(
                   [(5, 1), (1, 4), (4, 8)], "src long, dst long")})
    return GraphSession(g)


def _at_hop(gs, rel_types, distance):
    lit = "null" if rel_types is None else repr(rel_types)
    rows = gs.execute(f"CALL neighbors.at_hop(1, {lit}, {distance}) "
                      "YIELD nodes RETURN nodes").collect()
    return sorted(r.nodes for r in rows)


def _by_hop(gs, rel_types, distance):
    lit = "null" if rel_types is None else repr(rel_types)
    rows = gs.execute(f"CALL neighbors.by_hop(1, {lit}, {distance}) "
                      "YIELD nodes RETURN nodes").collect()
    return [sorted(r.nodes) for r in rows]


def test_single_bare_type_both_directions(gs):
    assert _at_hop(gs, ["E"], 1) == [2, 3]


def test_outgoing_prefix(gs):
    assert _at_hop(gs, ["E>"], 1) == [2]


def test_incoming_prefix(gs):
    assert _at_hop(gs, ["<E"], 1) == [3]


def test_multi_type_union(gs):
    # round-4 bug: only rel_types[0] was honored -> [2, 3]
    assert _at_hop(gs, ["E", "F"], 1) == [2, 3, 4, 5]


def test_mixed_direction_prefixes(gs):
    assert _at_hop(gs, ["E>", "<F"], 1) == [2, 5]


def test_empty_list_matches_any(gs):
    assert _at_hop(gs, [], 1) == [2, 3, 4, 5]
    assert _at_hop(gs, None, 1) == [2, 3, 4, 5]


def test_bare_angle_any_type_per_direction(gs):
    # "<" = any type incoming, ">" = any type outgoing (substr of "")
    assert _at_hop(gs, ["<"], 1) == [3, 5]
    assert _at_hop(gs, [">"], 1) == [2, 4]


def test_both_prefixes_raise(gs):
    with pytest.raises(Exception, match="[Ii]nvalid relationship"):
        _at_hop(gs, ["<E>"], 1)


def test_two_hop_multi_type(gs):
    # out-only over both types: hop1 {2,4}, hop2 {7,8}
    assert _at_hop(gs, ["E>", "F>"], 2) == [7, 8]


def test_by_hop_multi_type(gs):
    assert _by_hop(gs, ["E>", "F>"], 2) == [[2, 4], [7, 8]]


def test_by_hop_direction_union(gs):
    # bare E both dirs + F outgoing: hop1 {2,3,4}; hop2 from 2->7 (E out),
    # 4->8 (F out); 3 has no further E/F> edge except 3->1 (visited)
    assert _by_hop(gs, ["E", "F>"], 2) == [[2, 3, 4], [7, 8]]


VEC_Q = ("UNWIND [1, 2] AS v "
         "CALL neighbors.at_hop(v, ['E>', '<F'], 1) YIELD nodes "
         "RETURN v, nodes")


def _force_loop(monkeypatch, *names):
    from memgraph_spark import procedures as P
    for n in names:
        monkeypatch.delitem(P.VECTORIZED, n)


def test_vectorized_multi_type_matches_loop(gs, monkeypatch):
    vec = sorted(map(tuple, gs.execute(VEC_Q).collect()))
    # v=1: E> -> 2; <F -> 5. v=2: E> -> 7; <F -> none; (<E would be 1).
    assert vec == [(1, 2), (1, 5), (2, 7)]
    _force_loop(monkeypatch, "neighbors.at_hop")
    assert sorted(map(tuple, gs.execute(VEC_Q).collect())) == vec


def test_vectorized_by_hop_multi_type_matches_loop(gs, monkeypatch):
    q = ("UNWIND [1] AS v "
         "CALL neighbors.by_hop(v, ['E', 'F>'], 2) YIELD nodes "
         "RETURN nodes")
    vec = sorted(sorted(r.nodes) for r in gs.execute(q).collect())
    assert vec == [[2, 3, 4], [7, 8]]
    _force_loop(monkeypatch, "neighbors.by_hop")
    got = sorted(sorted(r.nodes) for r in gs.execute(q).collect())
    assert got == vec


def test_vectorized_rel_exists_empty_list(gs, monkeypatch):
    """ADVICE r4: empty types list = reference default "" = match any
    (node.cpp:144) — the vectorized path must agree with the loop."""
    q = ("UNWIND [1, 8] AS v "
         "CALL node.relationship_exists(v, []) YIELD exists AS ex "
         "RETURN v, ex")
    vec = sorted(map(tuple, gs.execute(q).collect()))
    assert vec == [(1, True), (8, True)]
    _force_loop(monkeypatch, "node.relationship_exists")
    assert sorted(map(tuple, gs.execute(q).collect())) == vec
