"""No-torch distributed single-head GATv2 (layer_type GATv2) — reference
mage/node_classification/models/gatv2.py (PyG GATv2Conv: the attention
vector applies AFTER the LeakyReLU — "dynamic attention"). Twin test
pins the distributed trainer against a local numpy implementation of the
identical algebra."""

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


def test_gatv2_matches_local_numpy_twin(spark):
    from memgraph_spark.algos.gatv2 import gatv2_train
    g = _two_cluster_graph(spark)
    rows_df, model = gatv2_train(g, hidden_sizes=[4], num_epochs=3,
                                 learning_rate=0.3, weight_decay=0.0,
                                 seed=7)
    rows = rows_df.collect()

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
            "Wl": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "Wr": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "a": rng.uniform(-lim_a, lim_a, dims[i + 1]),
            "b": np.zeros(dims[i + 1])})

    def leaky(x):
        return np.where(x > 0, x, NEG * x)

    def forward(H, lay, relu):
        UL, UR = H @ lay["Wl"], H @ lay["Wr"]
        Q = np.stack([UL[j] + UR[i] for j, i in E])
        ev = leaky(Q) @ lay["a"]
        alpha = np.zeros(len(E))
        for i in range(N):
            ks = [k for k, (_j, d) in enumerate(E) if d == i]
            m = max(ev[k] for k in ks)
            ex = np.array([np.exp(ev[k] - m) for k in ks])
            for k, a in zip(ks, ex / ex.sum()):
                alpha[k] = a
        out = np.zeros_like(UL)
        for k, (j, i) in enumerate(E):
            out[i] += alpha[k] * UL[j]
        Z = out + lay["b"]
        return UL, UR, Q, alpha, (np.maximum(Z, 0) if relu else Z)

    losses = []
    for _ in range(3):
        UL1, UR1, Q1, al1, H1 = forward(X, layers[0], True)
        UL2, UR2, Q2, al2, Z = forward(H1, layers[1], False)
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(N), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(N), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0

        def backward(G, H_in, UL, Q, alpha, lay):
            db = G.sum(axis=0)
            dal = np.array([G[i] @ UL[j] for j, i in E])
            S = np.zeros(N)
            for k, (_j, i) in enumerate(E):
                S[i] += alpha[k] * dal[k]
            de = np.array([alpha[k] * (dal[k] - S[i])
                           for k, (_j, i) in enumerate(E)])
            da = (leaky(Q) * de[:, None]).sum(axis=0)
            dQ = de[:, None] * lay["a"] * np.where(Q > 0, 1.0, NEG)
            dUL = np.zeros_like(UL)
            dUR = np.zeros_like(UL)
            for k, (j, i) in enumerate(E):
                dUL[j] += alpha[k] * G[i] + dQ[k]
                dUR[i] += dQ[k]
            dWl = H_in.T @ dUL
            dWr = H_in.T @ dUR
            dH = dUL @ lay["Wl"].T + dUR @ lay["Wr"].T
            return dWl, dWr, da, db, dH

        dWl2, dWr2, da2, db2, dH1 = backward(G, H1, UL2, Q2, al2,
                                             layers[1])
        dH1 *= (H1 > 0)
        dWl1, dWr1, da1, db1, _ = backward(dH1, X, UL1, Q1, al1,
                                           layers[0])
        for lay, (dWl, dWr, da, db) in zip(
                layers, [(dWl1, dWr1, da1, db1),
                         (dWl2, dWr2, da2, db2)]):
            lay["Wl"] -= 0.3 * dWl
            lay["Wr"] -= 0.3 * dWr
            lay["a"] -= 0.3 * da
            lay["b"] -= 0.3 * db

    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    assert np.allclose(np.array(model["layers"][0]["Wl"]),
                       layers[0]["Wl"], atol=1e-8)
    assert np.allclose(np.array(model["layers"][1]["a"]),
                       layers[1]["a"], atol=1e-8)


def test_gatv2_learns_and_predicts(spark):
    from memgraph_spark.algos.gnn import (
        node_classification_predict, node_classification_train)
    g = _two_cluster_graph(spark)
    out = node_classification_train(
        g, num_epochs=25, learning_rate=0.3, deep=True,
        layer_type="GATv2", hidden_sizes=[8]).collect()
    assert out[-1].loss < out[0].loss
    assert out[-1].train_log[0] >= 0.9
    r0 = node_classification_predict(g, 2).collect()[0]
    r1 = node_classification_predict(g, 22).collect()[0]
    assert (r0.predicted_class, r1.predicted_class) == (0, 1)
