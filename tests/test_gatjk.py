"""No-torch distributed GATJK — the reference's DEFAULT deep model
(mage/node_classification/models/gatjk.py: multi-head GATConv stack,
no self-loops, ELU, JumpingKnowledge max, final Linear). Twin test pins
the distributed trainer against a local numpy implementation of the
identical algebra (2 heads, 2 conv layers)."""

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


def _graph_arrays(spark, g):
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
    E = sorted((idx[s], idx[d]) for s, d in und)   # NO self-loops
    X = np.stack([data[n][0] for n in ids])
    y = np.array([-1 if data[n][1] is None else data[n][1] for n in ids])
    split_rows = (g.node("N")
                  .select("id", (F.pmod(F.xxhash64("id"), 1000) < 800)
                          .alias("tr")).collect())
    tr_map = {r.id: r.tr for r in split_rows}
    labeled = y >= 0
    train = np.array([labeled[i] and tr_map[n]
                      for i, n in enumerate(ids)])
    return ids, E, X, y, labeled, train


def test_gatjk_matches_local_numpy_twin(spark):
    from memgraph_spark.algos.gatjk import gatjk_train
    g = _two_cluster_graph(spark)
    rows_df, model = gatjk_train(g, hidden_sizes=[3, 3], num_epochs=3,
                                 learning_rate=0.3, weight_decay=0.0,
                                 seed=7, heads=2)
    rows = rows_df.collect()

    ids, E, X, y, labeled, train = _graph_arrays(spark, g)
    n_train = int(train.sum())
    N = len(ids)
    heads, hid, k = 2, 3, 2
    hw = hid * heads
    in_dims = [2, hw]
    rng = np.random.default_rng(7)
    convs = []
    for li, d_in in enumerate(in_dims):
        lim = np.sqrt(6.0 / (d_in + hid))
        lim_a = np.sqrt(6.0 / (hid + 1))
        convs.append({
            "heads": [{"W": rng.uniform(-lim, lim, (d_in, hid)),
                       "a_src": rng.uniform(-lim_a, lim_a, hid),
                       "a_dst": rng.uniform(-lim_a, lim_a, hid),
                       "b": np.zeros(hid)}
                      for _ in range(heads)],
            "b": np.zeros(hw)})
    lim_f = np.sqrt(6.0 / (hw + k))
    Wf = rng.uniform(-lim_f, lim_f, (hw, k))
    bf = np.zeros(k)

    def head_fwd(H, hd):
        U = H @ hd["W"]
        ssrc, sdst = U @ hd["a_src"], U @ hd["a_dst"]
        pre = np.array([ssrc[j] + sdst[i] for j, i in E])
        ev = np.where(pre > 0, pre, NEG * pre)
        alpha = np.zeros(len(E))
        for i in range(N):
            ks = [kk for kk, (_j, d) in enumerate(E) if d == i]
            if not ks:
                continue
            m = max(ev[kk] for kk in ks)
            ex = np.array([np.exp(ev[kk] - m) for kk in ks])
            for kk, a in zip(ks, ex / ex.sum()):
                alpha[kk] = a
        out = np.zeros_like(U)
        for kk, (j, i) in enumerate(E):
            out[i] += alpha[kk] * U[j]
        return U, pre, alpha, out

    def head_bwd(Gh, H_in, U, pre, alpha, hd):
        dal = np.array([Gh[i] @ U[j] for j, i in E])
        S = np.zeros(N)
        for kk, (_j, i) in enumerate(E):
            S[i] += alpha[kk] * dal[kk]
        dpre = np.array([alpha[kk] * (dal[kk] - S[i])
                         * (1.0 if pre[kk] > 0 else NEG)
                         for kk, (_j, i) in enumerate(E)])
        ds_src = np.zeros(N); ds_dst = np.zeros(N)
        for kk, (j, i) in enumerate(E):
            ds_src[j] += dpre[kk]; ds_dst[i] += dpre[kk]
        dU = np.zeros_like(U)
        for kk, (j, i) in enumerate(E):
            dU[j] += alpha[kk] * Gh[i]
        dU += np.outer(ds_src, hd["a_src"])
        dU += np.outer(ds_dst, hd["a_dst"])
        da_s = U.T @ ds_src
        da_d = U.T @ ds_dst
        dW = H_in.T @ dU
        dH = dU @ hd["W"].T
        return dW, da_s, da_d, dH

    def elu(x):
        return np.where(x > 0, x, np.exp(np.minimum(x, 0.0)) - 1.0)

    losses = []
    for _ in range(3):
        # forward
        caches = []
        xs = []
        cur = X
        for li, conv in enumerate(convs):
            parts = []
            hcaches = []
            for hd in conv["heads"]:
                U, pre, alpha, out = head_fwd(cur, hd)
                parts.append(out)
                hcaches.append((U, pre, alpha))
            raw = np.concatenate(parts, axis=1) + conv["b"]
            caches.append((cur, hcaches))
            if li < 1:
                nxt = elu(raw)
                xs.append(nxt)
                cur = nxt
            else:
                xs.append(raw)
        stack = np.stack(xs)
        am = stack.argmax(axis=0)
        JK = stack.max(axis=0)
        Z = JK @ Wf + bf
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(N), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(N), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0
        # backward
        dWf = JK.T @ G
        dbf = G.sum(axis=0)
        dJK = G @ Wf.T
        dxs = [dJK * (am == li) for li in range(2)]
        conv_grads = [None, None]
        g_above = None
        for li in (1, 0):
            gsum = dxs[li] + (g_above if g_above is not None else 0.0)
            if li < 1:
                Xp = xs[li]
                graw = gsum * np.where(Xp > 0, 1.0, Xp + 1.0)
            else:
                graw = gsum
            cur_in, hcaches = caches[li]
            head_grads = []
            dh_acc = np.zeros_like(cur_in, dtype=np.float64)
            for hi, hd in enumerate(convs[li]["heads"]):
                Gh = graw[:, hi * hid:(hi + 1) * hid]
                U, pre, alpha = hcaches[hi]
                dW, das, dad, dH = head_bwd(Gh, cur_in, U, pre, alpha,
                                            hd)
                head_grads.append((dW, das, dad))
                dh_acc += dH
            db = graw.sum(axis=0)
            conv_grads[li] = (head_grads, db)
            g_above = dh_acc if li > 0 else None
        for conv, (head_grads, db) in zip(convs, conv_grads):
            for hd, (dW, das, dad) in zip(conv["heads"], head_grads):
                hd["W"] -= 0.3 * dW
                hd["a_src"] -= 0.3 * das
                hd["a_dst"] -= 0.3 * dad
            conv["b"] -= 0.3 * db
        Wf -= 0.3 * dWf
        bf -= 0.3 * dbf

    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    assert np.allclose(np.array(model["convs"][0]["heads"][1]["W"]),
                       convs[0]["heads"][1]["W"], atol=1e-8)
    assert np.allclose(np.array(model["Wf"]), Wf, atol=1e-8)


def test_gatjk_learns_and_predicts(spark):
    from memgraph_spark.algos.gnn import (
        node_classification_predict, node_classification_train)
    g = _two_cluster_graph(spark)
    out = node_classification_train(
        g, num_epochs=20, learning_rate=0.3, deep=True,
        layer_type="GATJK", hidden_sizes=[4, 4]).collect()
    assert out[-1].loss < out[0].loss
    assert out[-1].train_log[0] >= 0.9
    r0 = node_classification_predict(g, 2).collect()[0]
    r1 = node_classification_predict(g, 22).collect()[0]
    assert (r0.predicted_class, r1.predicted_class) == (0, 1)


def test_gatjk_requires_equal_hidden_sizes(spark):
    from memgraph_spark.algos.gatjk import gatjk_train
    g = _two_cluster_graph(spark)
    with pytest.raises(ValueError, match="equal hidden sizes"):
        gatjk_train(g, hidden_sizes=[8, 4], num_epochs=1)
