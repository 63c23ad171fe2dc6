"""Distributed BCC (VERDICT r3 item 7): the spanning-tree +
fundamental-cycle variant must partition edges into the same biconnected
components as the driver Hopcroft-Tarjan core; the size fence routes
instead of refusing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph


def _canon(rows):
    """bcc ids are arbitrary in both variants: canonicalize as a set of
    frozensets of normalized edges."""
    groups = {}
    for r in rows:
        a, b = sorted((r.node_from, r.node_to))
        groups.setdefault(r.bcc_id, set()).add((a, b))
    return frozenset(frozenset(g) for g in groups.values())


def _graph(spark, edges):
    g = PropertyGraph(
        spark,
        nodes={"V": spark.createDataFrame(
            [(i,) for i in sorted({x for e in edges for x in e})],
            "id long")},
        edges={"E": spark.createDataFrame(edges, "src long, dst long")})
    return g


CASES = {
    "bowtie": [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)],
    "bridge_chain": [(0, 1), (1, 2), (2, 3)],
    "cycle_with_tail": [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4), (4, 5)],
    "nested_cycles": [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3), (3, 0),
                      (5, 6)],
    "two_blocks_chain": [(0, 1), (1, 2), (2, 0),   # triangle
                         (2, 3),                    # bridge
                         (3, 4), (4, 5), (5, 3)],   # triangle
    "k4": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
    "disconnected": [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_distributed_matches_driver_core(spark, name):
    from memgraph_spark.algos.biconnected import (
        biconnected_components, biconnected_components_distributed)
    g = _graph(spark, CASES[name])
    core = _canon(biconnected_components(g).collect())
    dist = _canon(biconnected_components_distributed(g).collect())
    assert dist == core


def test_fence_routes_to_distributed(spark, monkeypatch):
    """Past max_edges the call returns the distributed result instead of
    raising."""
    from memgraph_spark.algos import biconnected as B
    g = _graph(spark, CASES["two_blocks_chain"])
    rows = B.biconnected_components(g, max_edges=2).collect()
    assert _canon(rows) == _canon(
        B.biconnected_components_distributed(g).collect())


def test_empty_graph(spark):
    from memgraph_spark.algos.biconnected import (
        biconnected_components_distributed)
    g = PropertyGraph(spark, nodes={}, edges={})
    assert biconnected_components_distributed(g).collect() == []


def test_max_rounds_exhaustion_raises(spark):
    """ADVICE r4: a graph deeper than max_rounds must raise, not silently
    drop the deep nodes from the spanning forest / mislabel unfinished
    cycles."""
    from memgraph_spark.algos.biconnected import (
        biconnected_components_distributed)
    chain = [(i, i + 1) for i in range(6)] + [(0, 6)]  # 7-cycle, depth 6
    g = _graph(spark, chain)
    with pytest.raises(ValueError, match="max_rounds"):
        biconnected_components_distributed(g, max_rounds=2)


def test_depth_exactly_max_rounds_converges(spark):
    """ADVICE r5: a BFS tree of depth EXACTLY max_rounds is complete —
    the final frontier is the deepest fully-visited level, and the guard
    must not reject it. The closing cycle also exercises the lifting
    loop at its own boundary (deepest endpoint lifts max_rounds times)."""
    from memgraph_spark.algos.biconnected import (
        biconnected_components, biconnected_components_distributed)
    d = 4
    # a (2d+1)-cycle: BFS from root 0 runs down both sides, so the two
    # deepest nodes sit at depth exactly d and the non-tree edge joins
    # them — lifting then needs exactly d rounds too
    cyc = [(i, i + 1) for i in range(2 * d)] + [(2 * d, 0)]
    g = _graph(spark, cyc)
    rows = biconnected_components_distributed(g, max_rounds=d).collect()
    assert _canon(rows) == _canon(biconnected_components(g).collect())
    # one round short must still raise (true positive preserved)
    with pytest.raises(ValueError, match="max_rounds"):
        biconnected_components_distributed(g, max_rounds=d - 1)
