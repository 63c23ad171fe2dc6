"""No-torch distributed single-head GAT (layer_type GAT) — reference
mage/node_classification/models/gat.py (PyG GATConv defaults: heads=1,
add_self_loops=True, negative_slope=0.2) re-expressed as numpy +
DataFrame message passing. The key test trains the identical algebra
with a LOCAL numpy implementation and asserts the distributed trainer
reproduces its loss trajectory and weights."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph

pytestmark = pytest.mark.slow  # multi-epoch training; skipped by default (conftest)


NEG = 0.2


def _two_cluster_graph(spark):
    rows = []
    for i in range(20):
        jitter = (i % 5) * 0.05
        rows.append((i, [1.0 - jitter, jitter], 0))
    for i in range(20, 40):
        jitter = (i % 5) * 0.05
        rows.append((i, [jitter, 1.0 - jitter], 1))
    rows.append((40, [0.9, 0.1], None))
    nodes = spark.createDataFrame(
        rows, "id long, features array<double>, class long")
    edges = [(i, (i + 1) % 20) for i in range(20)]
    edges += [(i, 20 + (i + 1) % 20) for i in range(20, 40)]
    edges.append((40, 0))
    edf = (spark.createDataFrame(edges, "src long, dst long")
           .withColumn("eid", F.xxhash64("src", "dst")))
    return PropertyGraph(spark, nodes={"N": nodes}, edges={"E": edf})


def test_gat_matches_local_numpy_twin(spark):
    from memgraph_spark.algos.gat import gat_train
    g = _two_cluster_graph(spark)
    rows_df, model = gat_train(g, hidden_sizes=[4], num_epochs=4,
                               learning_rate=0.3, weight_decay=0.0,
                               seed=7)
    rows = rows_df.collect()

    # ---- local twin ----------------------------------------------------
    data = {r.id: (np.array(r.features), r["class"])
            for r in g.node("N").collect()}
    eds = [(r.src, r.dst) for r in g.edge("E").select("src", "dst")
           .collect()]
    und = set()
    for s, d in eds:
        if s != d:
            und.add((s, d)); und.add((d, s))
    ids = sorted(data)
    idx = {n: i for i, n in enumerate(ids)}
    # edge list j -> i including self-loops, in index space
    E = sorted({(idx[s], idx[d]) for s, d in und}
               | {(i, i) for i in range(len(ids))})
    X = np.stack([data[n][0] for n in ids])
    y = np.array([-1 if data[n][1] is None else data[n][1] for n in ids])
    split_rows = (g.node("N")
                  .select("id", (F.pmod(F.xxhash64("id"), 1000) < 800)
                          .alias("tr")).collect())
    tr_map = {r.id: r.tr for r in split_rows}
    labeled = y >= 0
    train = np.array([labeled[i] and tr_map[n]
                      for i, n in enumerate(ids)])
    n_train = int(train.sum())
    N = len(ids)

    dims = [2, 4, 2]
    rng = np.random.default_rng(7)
    layers = []
    for i in range(2):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        lim_a = np.sqrt(6.0 / (dims[i + 1] + 1))
        layers.append({
            "W": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "a_src": rng.uniform(-lim_a, lim_a, dims[i + 1]),
            "a_dst": rng.uniform(-lim_a, lim_a, dims[i + 1]),
            "b": np.zeros(dims[i + 1])})

    def forward(H, lay, relu):
        U = H @ lay["W"]
        ssrc, sdst = U @ lay["a_src"], U @ lay["a_dst"]
        pre = np.array([ssrc[j] + sdst[i] for j, i in E])
        ev = np.where(pre > 0, pre, NEG * pre)
        alpha = np.zeros(len(E))
        for i in range(N):
            rows_i = [k for k, (_j, d) in enumerate(E) if d == i]
            m = max(ev[k] for k in rows_i)
            ex = np.array([np.exp(ev[k] - m) for k in rows_i])
            for k, a in zip(rows_i, ex / ex.sum()):
                alpha[k] = a
        out = np.zeros((N, U.shape[1]))
        for k, (j, i) in enumerate(E):
            out[i] += alpha[k] * U[j]
        Z = out + lay["b"]
        H2 = np.maximum(Z, 0) if relu else Z
        return U, pre, alpha, H2

    losses = []
    for _ in range(4):
        U1, pre1, al1, H1 = forward(X, layers[0], True)
        U2, pre2, al2, Z = forward(H1, layers[1], False)
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(N), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(N), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0

        def backward(G, H_in, U, pre, alpha, lay):
            db = G.sum(axis=0)
            dal = np.array([G[i] @ U[j] for j, i in E])
            S = np.zeros(N)
            for k, (_j, i) in enumerate(E):
                S[i] += alpha[k] * dal[k]
            dpre = np.array([alpha[k] * (dal[k] - S[i])
                             * (1.0 if pre[k] > 0 else NEG)
                             for k, (_j, i) in enumerate(E)])
            ds_src = np.zeros(N); ds_dst = np.zeros(N)
            for k, (j, i) in enumerate(E):
                ds_src[j] += dpre[k]; ds_dst[i] += dpre[k]
            dU = np.zeros_like(U)
            for k, (j, i) in enumerate(E):
                dU[j] += alpha[k] * G[i]
            dU += np.outer(ds_src, lay["a_src"])
            dU += np.outer(ds_dst, lay["a_dst"])
            da_s = U.T @ ds_src
            da_d = U.T @ ds_dst
            dW = H_in.T @ dU
            dH = dU @ lay["W"].T
            return dW, da_s, da_d, db, dH

        dW2, das2, dad2, db2, dH1 = backward(G, H1, U2, pre2, al2,
                                             layers[1])
        dH1 *= (H1 > 0)
        dW1, das1, dad1, db1, _ = backward(dH1, X, U1, pre1, al1,
                                           layers[0])
        for lay, (dW, das, dad, db) in zip(
                layers, [(dW1, das1, dad1, db1),
                         (dW2, das2, dad2, db2)]):
            lay["W"] -= 0.3 * dW
            lay["a_src"] -= 0.3 * das
            lay["a_dst"] -= 0.3 * dad
            lay["b"] -= 0.3 * db

    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    assert np.allclose(np.array(model["layers"][0]["W"]),
                       layers[0]["W"], atol=1e-8)
    assert np.allclose(np.array(model["layers"][1]["a_src"]),
                       layers[1]["a_src"], atol=1e-8)


def test_gat_learns_and_predicts(spark):
    from memgraph_spark.algos.gnn import (
        node_classification_predict, node_classification_train)
    g = _two_cluster_graph(spark)
    out = node_classification_train(
        g, num_epochs=25, learning_rate=0.3, deep=True,
        layer_type="GAT", hidden_sizes=[8]).collect()
    assert out[-1].loss < out[0].loss
    assert out[-1].train_log[0] >= 0.9
    r0 = node_classification_predict(g, 2).collect()[0]
    r1 = node_classification_predict(g, 22).collect()[0]
    assert (r0.predicted_class, r1.predicted_class) == (0, 1)


def test_unknown_layer_type_keeps_torch_gate(spark):
    """Every reference layer type (SAGE/GAT/GATv2/GATJK) now trains
    without torch; only an unrecognized layer type still hits the
    dependency gate."""
    from memgraph_spark.algos.gnn import (
        _HAS_TORCH, node_classification_train)
    if _HAS_TORCH:                                # pragma: no cover
        pytest.skip("torch present; gate not exercised")
    g = _two_cluster_graph(spark)
    with pytest.raises(NotImplementedError, match="torch"):
        node_classification_train(g, deep=True, layer_type="FancyNet")
