"""TGN no-torch baseline (reference src/mage/python/tgn.py surface):
time-decayed EMA memory + graph-sum embeddings + dot-product link scores,
all DataFrame ops. Torch-only configs keep the dependency gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph


def _graph(spark, n=16):
    nodes = spark.range(n).select(F.col("id"))
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    return PropertyGraph(spark, nodes={"V": nodes}, edges={"E": edges})


def _stream(reps=6):
    """Two interaction communities: {0..3} and {8..11}, repeated rounds
    with increasing timestamps; one late cross edge."""
    edges = []
    t = 0.0
    for _ in range(reps):
        for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]:
            edges.append((a, b, t)); t += 1.0
        for a, b in [(8, 9), (9, 10), (10, 11), (11, 8), (8, 10)]:
            edges.append((a, b, t)); t += 1.0
    return edges


def test_update_trains_batches_and_scores_communities(spark):
    import memgraph_spark.algos.tgn_baseline as TB
    g = _graph(spark)
    TB.tgn_set_params(g, {"batch_size": 10, "memory_dimension": 8})
    TB.tgn_update(g, _stream())
    st = g._tgn_state
    assert st["batch"] == 6              # 60 edges / batch_size 10
    intra = TB.tgn_predict_link_score(g, 0, 2).collect()[0].prediction
    cross = TB.tgn_predict_link_score(g, 0, 10).collect()[0].prediction
    assert 0.0 <= cross <= 1.0 and 0.0 <= intra <= 1.0
    assert intra > cross                 # co-interacting pair scores higher


def test_get_embeddings_shape(spark):
    import memgraph_spark.algos.tgn_baseline as TB
    g = _graph(spark)
    TB.tgn_set_params(g, {"batch_size": 10, "memory_dimension": 8})
    TB.tgn_update(g, _stream(2))
    rows = TB.tgn_get(g).collect()
    assert len(rows) == 16
    assert all(len(r.embedding) == 8 for r in rows)
    # touched nodes have non-zero embeddings; untouched stay zero
    by_id = {r.node: r.embedding for r in rows}
    assert any(abs(x) > 0 for x in by_id[0])
    assert all(x == 0.0 for x in by_id[5])


def test_train_and_eval_records(spark):
    import memgraph_spark.algos.tgn_baseline as TB
    g = _graph(spark)
    TB.tgn_set_params(g, {"batch_size": 10, "memory_dimension": 8})
    edges = _stream(4)
    TB.tgn_update(g, edges[:30])
    TB.tgn_set_eval(g)
    TB.tgn_update(g, edges[30:])
    rows = TB.tgn_train_and_eval(g, num_epochs=2).collect()
    assert {r.batch_type for r in rows} == {"train", "eval"}
    assert {r.epoch_num for r in rows} == {1, 2}
    assert all(0.0 <= r.precision <= 1.0 for r in rows)
    got = TB.tgn_get_results(g).collect()
    assert len(got) >= len(rows)


def test_requires_set_eval_before_train(spark):
    import memgraph_spark.algos.tgn_baseline as TB
    g = _graph(spark)
    TB.tgn_set_params(g, {})
    with pytest.raises(ValueError, match="set_eval"):
        TB.tgn_train_and_eval(g, 1)


def test_deep_configs_route_without_torch(spark):
    """gru/rnn updaters (every reference e2e config) now instantiate
    the real numpy TGN trainer instead of raising the torch gate; only
    genuinely unknown configs still raise."""
    import memgraph_spark.algos.tgn_baseline as TB
    g = _graph(spark)
    TB.tgn_set_params(g, {"memory_updater_type": "gru"})
    assert g._tgn_state["deep"] is not None
    TB.tgn_reset(g)
    with pytest.raises(ValueError, match="memory_updater_type"):
        TB.tgn_set_params(g, {"memory_updater_type": "bogus"})


def test_procedure_surface(spark):
    from memgraph_spark.plans import GraphSession
    g = _graph(spark)
    gs = GraphSession(g)
    r = gs.execute("CALL tgn.set_params({batch_size: 10, "
                   "memory_dimension: 8}) YIELD message RETURN message"
                   ).collect()
    assert "initialized" in r[0].message
    gs.execute("CALL tgn.update([[0, 1, 0.0], [1, 2, 1.0], [2, 3, 2.0], "
               "[3, 0, 3.0], [0, 2, 4.0], [8, 9, 5.0], [9, 10, 6.0], "
               "[10, 11, 7.0], [11, 8, 8.0], [8, 10, 9.0]]) YIELD *"
               " RETURN 1 AS ok")
    rows = gs.execute("CALL tgn.get() YIELD node, embedding "
                      "RETURN count(*) AS n").collect()
    assert rows[0].n == 16
    p = gs.execute("CALL tgn.predict_link_score(0, 2) YIELD prediction "
                   "RETURN prediction").collect()[0]
    assert 0.0 <= p.prediction <= 1.0
    r = gs.execute("CALL tgn.reset() YIELD message RETURN message"
                   ).collect()
    assert "Reset" in r[0].message


def test_node2vec_online_surface(spark):
    """node2vec_online parity (query_modules/node2vec_online_module):
    set updater + learner, stream edges, get (node, embedding), reset;
    uninitialized update errors like the reference."""
    from memgraph_spark.plans import GraphSession
    g = _graph(spark)
    gs = GraphSession(g)
    with pytest.raises(Exception, match="set_streamwalk_updater"):
        gs.execute("CALL node2vec_online.update([[0, 1]]) YIELD * "
                   "RETURN 1 AS ok").collect()
    r = gs.execute("CALL node2vec_online.set_streamwalk_updater"
                   "(7200, 4, 0.9, 604800, 2) YIELD message "
                   "RETURN message").collect()
    assert "updater" in r[0].message.lower()
    r = gs.execute("CALL node2vec_online.set_word2vec_learner(16, 0.05) "
                   "YIELD message RETURN message").collect()
    assert "learner" in r[0].message.lower()
    gs.execute("CALL node2vec_online.update([[0, 1], [1, 2], [2, 0], "
               "[3, 4], [4, 5], [5, 3]]) YIELD * RETURN 1 AS ok")
    rows = gs.execute("CALL node2vec_online.get() YIELD node, embedding "
                      "RETURN node, size(embedding) AS d ORDER BY node"
                      ).collect()
    assert [r.node for r in rows] == [0, 1, 2, 3, 4, 5]
    assert all(r.d == 16 for r in rows)
    r = gs.execute("CALL node2vec_online.reset() YIELD message "
                   "RETURN message").collect()
    assert "reset" in r[0].message.lower()
    h = gs.execute("CALL node2vec_online.help() YIELD name, value "
                   "RETURN count(*) AS n").collect()
    assert h[0].n == 5


def test_eval_precision_plan_has_no_window(spark):
    """VERDICT r6 item 3: the EMA eval scoring plan must carry no Window
    operator at all (the old negative draw ranked EVERY node embedding
    through a single-partition Window.orderBy per batch). The dense
    (rk, node) pool comes from zipWithIndex; scoring is joins only."""
    import memgraph_spark.algos.tgn_baseline as TB
    g = _graph(spark)
    TB.tgn_set_params(g, {"batch_size": 10, "memory_dimension": 8})
    TB.tgn_update(g, _stream(2))
    emb = TB.tgn_get(g).localCheckpoint(eager=True)
    pool, n = TB._neg_pool(g, emb)
    assert n == 16
    scored = TB._precision_frame(
        g, [(0, 1, 3.0), (8, 9, 4.0)], emb, pool, n)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    rows = scored.collect()
    assert len(rows) == 2
    assert all(r.wneg in range(16) for r in rows)
    # precision through the shared-pool path matches the own-pool path
    p_shared = TB._eval_precision(g, [(0, 1, 3.0), (8, 9, 4.0)],
                                  emb=emb, pool=pool, n=n)
    p_own = TB._eval_precision(g, [(0, 1, 3.0), (8, 9, 4.0)])
    assert p_shared == p_own
    from memgraph_spark.session import free_checkpoint
    free_checkpoint(pool); free_checkpoint(emb)
    TB.tgn_reset(g)
