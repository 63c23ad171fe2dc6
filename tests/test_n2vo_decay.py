"""node2vec_online temporal decay (VERDICT r4 item 2) + void update
cardinality (ADVICE r4).

Reference StreamWalk (query_modules/node2vec_online_module/algorithm/
stream_walk_updater.hpp:12): walk probability decays as
0.5^(age/half_life) and in-edges older than `cutoff` are dropped. The
batch re-expression applies both at get(): cutoff filters the history,
half_life weights the walk sampler's per-step race.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import memgraph_spark.procedures as P
from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession


def _graph(spark):
    nodes = spark.range(8).select(F.col("id"))
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    return PropertyGraph(spark, nodes={"V": nodes}, edges={"E": edges})


def _init(g, half_life=100, cutoff=1000):
    P._n2vo_set_streamwalk_updater(g, half_life=half_life, max_length=3,
                                   beta=0.9, cutoff=cutoff, sampled_walks=4)
    P._n2vo_set_word2vec_learner(g, embedding_dimension=16,
                                 learning_rate=0.05)


def _cos(a, b):
    a, b = np.array(a), np.array(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_cutoff_drops_old_edge_fresh_edge_converges(spark, monkeypatch):
    """An edge older than cutoff stops producing co-walks: its endpoints
    stay in the vocabulary but drift to independent init vectors, while a
    fresh edge's endpoints train together."""
    clock = {"t": 1_000}
    monkeypatch.setattr(P, "_n2vo_now", lambda: clock["t"])
    g = _graph(spark)
    _init(g, half_life=100, cutoff=1000)
    P._n2vo_update(g, [[20, 21]])          # arrives at t=1000
    clock["t"] = 3_000                     # 2000s later: past cutoff
    P._n2vo_update(g, [[30, 31]])
    rows = {r.node: r.embedding for r in P._n2vo_get(g).collect()}
    # old endpoints remain in the output (reference keeps learned nodes)
    assert set(rows) == {20, 21, 30, 31}
    assert _cos(rows[30], rows[31]) > _cos(rows[20], rows[21])


def test_within_cutoff_old_edge_still_walks(spark, monkeypatch):
    """Inside the cutoff both pairs co-walk — decay weights, not drops."""
    clock = {"t": 1_000}
    monkeypatch.setattr(P, "_n2vo_now", lambda: clock["t"])
    g = _graph(spark)
    _init(g, half_life=100, cutoff=10_000)
    P._n2vo_update(g, [[20, 21]])
    clock["t"] = 1_500
    P._n2vo_update(g, [[30, 31]])
    rows = {r.node: r.embedding for r in P._n2vo_get(g).collect()}
    # the aged pair still co-occurs in walks, so its similarity is well
    # above the independent-init level of the cutoff test
    assert _cos(rows[20], rows[21]) > 0.0


def test_infinite_half_life_matches_no_decay_path(spark, monkeypatch):
    """half_life large enough that the oldest decay factor rounds to 1.0
    routes to the unweighted plan — identical to a single-timestamp
    buffer of the same edges (the pre-decay behavior)."""
    edges = [[0, 1], [1, 2], [2, 0], [3, 4]]
    clock = {"t": 1_000}
    monkeypatch.setattr(P, "_n2vo_now", lambda: clock["t"])

    g1 = _graph(spark)
    _init(g1, half_life=10**20, cutoff=10**9)
    P._n2vo_update(g1, edges[:2])
    clock["t"] = 3_000
    P._n2vo_update(g1, edges[2:])
    a = {r.node: r.embedding for r in P._n2vo_get(g1).collect()}

    clock["t"] = 1_000
    g2 = _graph(spark)
    _init(g2, half_life=100, cutoff=10**9)
    P._n2vo_update(g2, edges)              # one batch, one timestamp
    b = {r.node: r.embedding for r in P._n2vo_get(g2).collect()}
    assert set(a) == set(b)
    for n in a:
        assert a[n] == pytest.approx(b[n])


def test_half_life_must_be_positive(spark):
    g = _graph(spark)
    with pytest.raises(ValueError, match="half_life must be positive"):
        P._n2vo_set_streamwalk_updater(g, half_life=0)


def test_update_preserves_frame_cardinality(spark):
    """ADVICE r4: in-query CALL ...update(b) with frame-dependent args is
    a void procedure — one empty record per call, so the UNWIND stream's
    cardinality survives (reference mgp.Record() semantics)."""
    g = _graph(spark)
    gs = GraphSession(g)
    gs.execute("CALL node2vec_online.set_streamwalk_updater() "
               "YIELD message RETURN message").collect()
    gs.execute("CALL node2vec_online.set_word2vec_learner(8) "
               "YIELD message RETURN message").collect()
    rows = gs.execute(
        "UNWIND [[[0, 1]], [[1, 2]], [[2, 3]]] AS b "
        "CALL node2vec_online.update(b) "
        "RETURN count(*) AS n").collect()
    assert rows[0].n == 3
    # the buffered stream really received all three batches
    assert g._n2v_online_state["edges_df"].count() == 3


def test_tgn_update_preserves_frame_cardinality(spark):
    g = _graph(spark)
    gs = GraphSession(g)
    gs.execute("CALL tgn.set_params({batch_size: 100, "
               "memory_dimension: 4}) YIELD message RETURN message"
               ).collect()
    rows = gs.execute(
        "UNWIND [[[0, 1, 0.0]], [[1, 2, 1.0]]] AS b "
        "CALL tgn.update(b) RETURN count(*) AS n").collect()
    assert rows[0].n == 2
