"""No-torch distributed GraphSAGE (layer_type SAGE) — reference
mage/node_classification/models/sage.py (PyG SAGEConv mean) re-expressed
as numpy + DataFrame message passing. The key test trains the same model
with a LOCAL numpy implementation of the identical algebra and asserts
the distributed trainer reproduces its loss trajectory and weights."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph

pytestmark = pytest.mark.slow  # multi-epoch training; skipped by default (conftest)



def _two_cluster_graph(spark):
    rows = []
    for i in range(20):
        jitter = (i % 5) * 0.05
        rows.append((i, [1.0 - jitter, jitter], 0))
    for i in range(20, 40):
        jitter = (i % 5) * 0.05
        rows.append((i, [jitter, 1.0 - jitter], 1))
    rows.append((40, [0.9, 0.1], None))          # unlabeled
    nodes = spark.createDataFrame(
        rows, "id long, features array<double>, class long")
    edges = [(i, (i + 1) % 20) for i in range(20)]
    edges += [(i, 20 + (i + 1) % 20) for i in range(20, 40)]
    edges.append((40, 0))
    edf = (spark.createDataFrame(edges, "src long, dst long")
           .withColumn("eid", F.xxhash64("src", "dst")))
    return PropertyGraph(spark, nodes={"N": nodes}, edges={"E": edf})


def test_sage_matches_local_numpy_twin(spark):
    """The distributed trainer must reproduce a local numpy
    implementation of the same algebra exactly (same seed/init/split):
    loss trajectory and final weights to 1e-8."""
    from memgraph_spark.algos.sage import sage_train
    g = _two_cluster_graph(spark)
    rows_df, model = sage_train(g, hidden_sizes=[4], num_epochs=5,
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
    nbrs = {}
    for s, d in und:
        nbrs.setdefault(s, []).append(d)
    ids = sorted(data)
    idx = {n: i for i, n in enumerate(ids)}
    X = np.stack([data[n][0] for n in ids])
    y = np.array([-1 if data[n][1] is None else data[n][1] for n in ids])
    # the trainer's split: pmod(xxhash64(id), 1000) < 800 => train
    split_rows = (g.node("N")
                  .select("id", (F.pmod(F.xxhash64("id"), 1000) < 800)
                          .alias("tr")).collect())
    tr_map = {r.id: r.tr for r in split_rows}
    labeled = y >= 0
    train = np.array([labeled[i] and tr_map[n]
                      for i, n in enumerate(ids)])
    val = labeled & ~train
    n_train = int(train.sum())

    def mean_nbr(H):
        M = np.zeros_like(H)
        for n, i in idx.items():
            js = nbrs.get(n, [])
            if js:
                M[i] = H[[idx[j] for j in js]].mean(axis=0)
        return M

    dims = [2, 4, 2]
    rng = np.random.default_rng(7)
    layers = []
    for i in range(2):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        layers.append([rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
                       rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
                       np.zeros(dims[i + 1])])
    losses = []
    for _ in range(5):
        M0 = mean_nbr(X)
        H1 = np.maximum(X @ layers[0][0] + M0 @ layers[0][1]
                        + layers[0][2], 0.0)
        M1 = mean_nbr(H1)
        Z = H1 @ layers[1][0] + M1 @ layers[1][1] + layers[1][2]
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(len(y)), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(len(y)), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0
        dWr2 = H1.T @ G
        dWn2 = M1.T @ G
        db2 = G.sum(axis=0)
        # scatter: transpose of the mean
        dM1 = G @ layers[1][1].T
        dH1 = G @ layers[1][0].T
        for n, i in idx.items():
            js = nbrs.get(n, [])
            for j in js:
                dH1[idx[j]] += dM1[i] / len(js)
        dH1 *= (H1 > 0)
        dWr1 = X.T @ dH1
        dWn1 = mean_nbr(X).T @ dH1
        db1 = dH1.sum(axis=0)
        layers[1][0] -= 0.3 * dWr2
        layers[1][1] -= 0.3 * dWn2
        layers[1][2] -= 0.3 * db2
        layers[0][0] -= 0.3 * dWr1
        layers[0][1] -= 0.3 * dWn1
        layers[0][2] -= 0.3 * db1

    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    got = np.array(model["layers"][0]["Wr"])
    want = layers[0][0]
    assert np.allclose(got, want, atol=1e-8)


def test_sage_learns_separable_graph(spark):
    from memgraph_spark.algos.gnn import (
        node_classification_predict, node_classification_train)
    g = _two_cluster_graph(spark)
    out = node_classification_train(
        g, num_epochs=30, learning_rate=0.3, deep=True,
        layer_type="SAGE", hidden_sizes=[8]).collect()
    assert len(out) == 30
    assert out[-1].loss < out[0].loss
    assert out[-1].train_log[0] >= 0.9
    r0 = node_classification_predict(g, 2).collect()[0]
    r1 = node_classification_predict(g, 22).collect()[0]
    assert (r0.predicted_class, r1.predicted_class) == (0, 1)
    # unlabeled node is predictable through its features + neighbourhood
    ru = node_classification_predict(g, 40).collect()[0]
    assert ru.predicted_class == 0


def test_attention_layers_train_and_sage_aggregator_gate(spark):
    """GATJK (like GAT/GATv2) now trains without torch, and SAGE runs
    every SAGEConv aggregator (mean/max/pool/gcn/lstm); the remaining
    gates are unknown aggregator names and unknown layer types."""
    from memgraph_spark.algos.gnn import node_classification_train
    g = _two_cluster_graph(spark)
    out = node_classification_train(g, deep=True, layer_type="GATJK",
                                    num_epochs=3, hidden_sizes=[4]).collect()
    assert len(out) == 3 and out[0].loss > 0.0
    with pytest.raises(NotImplementedError, match="mean"):
        node_classification_train(g, deep=True, layer_type="SAGE",
                                  aggregator="attn")


def test_sage_max_matches_local_numpy_twin(spark):
    """aggr='max' (PyG SAGEConv max pooling): the distributed trainer
    must reproduce a local numpy twin of the identical algebra — max
    over neighbour features elementwise, backward routed to the argmax
    contributor (largest-id tie-break on both sides)."""
    from memgraph_spark.algos.sage import sage_train
    g = _two_cluster_graph(spark)
    rows_df, model = sage_train(g, hidden_sizes=[4], num_epochs=5,
                                learning_rate=0.3, weight_decay=0.0,
                                seed=7, aggregator="max")
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
    nbrs = {}
    for s, d in und:
        nbrs.setdefault(s, []).append(d)
    ids = sorted(data)
    idx = {n: i for i, n in enumerate(ids)}
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

    def max_nbr(H):
        """Returns (M, ARG): ARG[i, pos] = row index of the winning
        neighbour (largest node id on ties), -1 when isolated."""
        M = np.zeros_like(H)
        ARG = np.full(H.shape, -1, dtype=int)
        for n, i in idx.items():
            js = nbrs.get(n, [])
            if not js:
                continue
            # sort ascending by node id so the LAST max occurrence is
            # the largest id — np.argmax picks the first, so scan from
            # largest id down
            rows_j = sorted(js)
            Hj = H[[idx[j] for j in rows_j]]
            for pos in range(H.shape[1]):
                best = 0
                for k in range(1, len(rows_j)):
                    if Hj[k, pos] >= Hj[best, pos]:
                        best = k
                M[i, pos] = Hj[best, pos]
                ARG[i, pos] = idx[rows_j[best]]
        return M, ARG

    dims = [2, 4, 2]
    rng = np.random.default_rng(7)
    layers = []
    for i in range(2):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        layers.append([rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
                       rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
                       np.zeros(dims[i + 1])])
    losses = []
    for _ in range(5):
        M0, A0 = max_nbr(X)
        H1 = np.maximum(X @ layers[0][0] + M0 @ layers[0][1]
                        + layers[0][2], 0.0)
        M1, A1 = max_nbr(H1)
        Z = H1 @ layers[1][0] + M1 @ layers[1][1] + layers[1][2]
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(len(y)), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(len(y)), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0
        dWr2 = H1.T @ G
        dWn2 = M1.T @ G
        db2 = G.sum(axis=0)
        dM1 = G @ layers[1][1].T
        dH1 = G @ layers[1][0].T
        for i in range(len(ids)):           # route to argmax contributor
            for pos in range(dims[1]):
                if A1[i, pos] >= 0:
                    dH1[A1[i, pos], pos] += dM1[i, pos]
        dH1 *= (H1 > 0)
        dWr1 = X.T @ dH1
        dWn1 = M0.T @ dH1
        db1 = dH1.sum(axis=0)
        layers[1][0] -= 0.3 * dWr2
        layers[1][1] -= 0.3 * dWn2
        layers[1][2] -= 0.3 * db2
        layers[0][0] -= 0.3 * dWr1
        layers[0][1] -= 0.3 * dWn1
        layers[0][2] -= 0.3 * db1

    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    assert model["aggregator"] == "max"
    got = np.array(model["layers"][0]["Wn"])
    assert np.allclose(got, layers[0][1], atol=1e-8)


def test_procedure_surface_layer_type_sage(spark):
    from memgraph_spark.plans import GraphSession
    g = _two_cluster_graph(spark)
    gs = GraphSession(g)
    gs.execute("CALL node_classification.set_model_parameters("
               "{layer_type: 'SAGE', hidden_features_size: [4], "
               "num_epochs: 3, learning_rate: 0.3}) "
               "YIELD status RETURN status").collect()
    rows = gs.execute("CALL node_classification.train() "
                      "YIELD epoch, loss RETURN epoch, loss "
                      "ORDER BY epoch").collect()
    assert [r.epoch for r in rows] == [1, 2, 3]
    assert g._nc_model["kind"] == "sage"
    p = gs.execute("CALL node_classification.predict(2) "
                   "YIELD predicted_class, status RETURN *").collect()[0]
    assert p.status == "Prediction complete."


def _twin_setup(g):
    """Shared local-twin scaffolding: (ids, idx, X, y, nbrs, train mask,
    n_train) replicating the trainer's deterministic split."""
    data = {r.id: (np.array(r.features), r["class"])
            for r in g.node("N").collect()}
    eds = [(r.src, r.dst) for r in g.edge("E").select("src", "dst")
           .collect()]
    und = set()
    for s, d in eds:
        if s != d:
            und.add((s, d)); und.add((d, s))
    nbrs = {}
    for s, d in und:
        nbrs.setdefault(s, []).append(d)
    ids = sorted(data)
    idx = {n: i for i, n in enumerate(ids)}
    X = np.stack([data[n][0] for n in ids])
    y = np.array([-1 if data[n][1] is None else data[n][1] for n in ids])
    split_rows = (g.node("N")
                  .select("id", (F.pmod(F.xxhash64("id"), 1000) < 800)
                          .alias("tr")).collect())
    tr_map = {r.id: r.tr for r in split_rows}
    labeled = y >= 0
    train = np.array([labeled[i] and tr_map[n]
                      for i, n in enumerate(ids)])
    return ids, idx, X, y, labeled, train, nbrs


def test_sage_gcn_matches_local_numpy_twin(spark):
    """aggregator='gcn' (DGL SAGEConv): z = ((sum_nbr + own)/(deg+1)) @ Wn
    + b, no root weight. The distributed path reuses the mean machinery
    over the self-loop-augmented adjacency with Wr pinned at zero; the
    twin computes the DGL formula directly — they must agree to 1e-8."""
    from memgraph_spark.algos.sage import sage_train
    g = _two_cluster_graph(spark)
    rows_df, model = sage_train(g, hidden_sizes=[4], num_epochs=5,
                                learning_rate=0.3, weight_decay=0.0,
                                seed=7, aggregator="gcn")
    rows = rows_df.collect()
    ids, idx, X, y, labeled, train, nbrs = _twin_setup(g)
    n_train = int(train.sum())
    # self-loop-augmented neighbour lists
    nbrs_self = {n: sorted(set(nbrs.get(n, [])) | {n}) for n in ids}

    def gcn_nbr(H):
        M = np.zeros_like(H)
        for n, i in idx.items():
            M[i] = H[[idx[j] for j in nbrs_self[n]]].mean(axis=0)
        return M

    dims = [2, 4, 2]
    rng = np.random.default_rng(7)
    layers = []
    for i in range(2):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        # rng draw order contract: gcn draws ONLY Wn (Wr is zeros)
        layers.append([np.zeros((dims[i], dims[i + 1])),
                       rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
                       np.zeros(dims[i + 1])])
    losses = []
    for _ in range(5):
        M0 = gcn_nbr(X)
        H1 = np.maximum(M0 @ layers[0][1] + layers[0][2], 0.0)
        M1 = gcn_nbr(H1)
        Z = M1 @ layers[1][1] + layers[1][2]
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(len(y)), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(len(y)), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0
        dWn2 = M1.T @ G
        db2 = G.sum(axis=0)
        dM1 = G @ layers[1][1].T
        dH1 = np.zeros_like(H1)
        for n, i in idx.items():        # transpose of the self-loop mean
            for j in nbrs_self[n]:
                dH1[idx[j]] += dM1[i] / len(nbrs_self[n])
        dH1 *= (H1 > 0)
        dWn1 = gcn_nbr(X).T @ dH1
        db1 = dH1.sum(axis=0)
        layers[1][1] -= 0.3 * dWn2
        layers[1][2] -= 0.3 * db2
        layers[0][1] -= 0.3 * dWn1
        layers[0][2] -= 0.3 * db1
    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    assert np.allclose(np.array(model["layers"][0]["Wn"]),
                       layers[0][1], atol=1e-8)
    assert np.allclose(np.array(model["layers"][0]["Wr"]), 0.0)


def test_sage_pool_matches_local_numpy_twin(spark):
    """aggregator='pool' (DGL SAGEConv): z = h@Wr +
    (max_nbr relu(h@Wp+bp))@Wn + b. Backward routes through the argmax
    contributor, the pool relu and Wp. Distributed == twin to 1e-8."""
    from memgraph_spark.algos.sage import sage_train
    g = _two_cluster_graph(spark)
    rows_df, model = sage_train(g, hidden_sizes=[4], num_epochs=5,
                                learning_rate=0.3, weight_decay=0.0,
                                seed=7, aggregator="pool")
    rows = rows_df.collect()
    ids, idx, X, y, labeled, train, nbrs = _twin_setup(g)
    n_train = int(train.sum())

    def max_nbr(Q):
        M = np.zeros_like(Q)
        ARG = np.full(Q.shape, -1, dtype=int)
        for n, i in idx.items():
            js = sorted(nbrs.get(n, []))
            if not js:
                continue
            Qj = Q[[idx[j] for j in js]]
            for pos in range(Q.shape[1]):
                best = 0
                for k2 in range(1, len(js)):
                    if Qj[k2, pos] >= Qj[best, pos]:
                        best = k2
                M[i, pos] = Qj[best, pos]
                ARG[i, pos] = idx[js[best]]
        return M, ARG

    dims = [2, 4, 2]
    rng = np.random.default_rng(7)
    layers = []
    for i in range(2):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        limp = np.sqrt(6.0 / (dims[i] + dims[i]))
        # rng draw order contract: Wr, Wn, then Wp
        layers.append([rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
                       rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
                       np.zeros(dims[i + 1]),
                       rng.uniform(-limp, limp, (dims[i], dims[i])),
                       np.zeros(dims[i])])
    losses = []
    for _ in range(5):
        Q0 = np.maximum(X @ layers[0][3] + layers[0][4], 0.0)
        M0, A0 = max_nbr(Q0)
        H1 = np.maximum(X @ layers[0][0] + M0 @ layers[0][1]
                        + layers[0][2], 0.0)
        Q1 = np.maximum(H1 @ layers[1][3] + layers[1][4], 0.0)
        M1, A1 = max_nbr(Q1)
        Z = H1 @ layers[1][0] + M1 @ layers[1][1] + layers[1][2]
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(len(y)), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(len(y)), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0
        # layer 2 weights
        dWr2 = H1.T @ G
        dWn2 = M1.T @ G
        db2 = G.sum(axis=0)
        # route dM1 through argmax -> pool relu -> Wp
        dM1 = G @ layers[1][1].T
        GQ1 = np.zeros_like(Q1)
        for i in range(len(ids)):
            for pos in range(dims[1]):
                if A1[i, pos] >= 0:
                    GQ1[A1[i, pos], pos] += dM1[i, pos]
        DQ1 = GQ1 * (Q1 > 0)
        dWp2 = H1.T @ DQ1
        dbp2 = DQ1.sum(axis=0)
        dH1 = G @ layers[1][0].T + DQ1 @ layers[1][3].T
        dH1 *= (H1 > 0)
        # layer 1 weights
        dWr1 = X.T @ dH1
        dWn1 = M0.T @ dH1
        db1 = dH1.sum(axis=0)
        dM0 = dH1 @ layers[0][1].T
        GQ0 = np.zeros_like(Q0)
        for i in range(len(ids)):
            for pos in range(dims[0]):
                if A0[i, pos] >= 0:
                    GQ0[A0[i, pos], pos] += dM0[i, pos]
        DQ0 = GQ0 * (Q0 > 0)
        dWp1 = X.T @ DQ0
        dbp1 = DQ0.sum(axis=0)
        layers[1][0] -= 0.3 * dWr2
        layers[1][1] -= 0.3 * dWn2
        layers[1][2] -= 0.3 * db2
        layers[1][3] -= 0.3 * dWp2
        layers[1][4] -= 0.3 * dbp2
        layers[0][0] -= 0.3 * dWr1
        layers[0][1] -= 0.3 * dWn1
        layers[0][2] -= 0.3 * db1
        layers[0][3] -= 0.3 * dWp1
        layers[0][4] -= 0.3 * dbp1
    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    assert np.allclose(np.array(model["layers"][0]["Wp"]),
                       layers[0][3], atol=1e-8)
    assert np.allclose(np.array(model["layers"][1]["Wr"]),
                       layers[1][0], atol=1e-8)


def test_lstm_bptt_matches_finite_differences():
    """The packed-sequence LSTM core (_np_lstm): analytic BPTT grads for
    every parameter tensor AND every input element match central finite
    differences on ragged sequences (lengths 1..6 incl. ties). Pure
    numpy — no Spark."""
    from memgraph_spark.algos.sage import _np_lstm
    rng = np.random.default_rng(0)
    d = 3
    Wih = rng.normal(size=(d, 4 * d)) * 0.4
    Whh = rng.normal(size=(d, 4 * d)) * 0.4
    b = rng.normal(size=4 * d) * 0.4
    lens = np.array([4, 1, 6, 2, 6, 3])
    flat = rng.normal(size=(int(lens.sum()), d))
    dm = rng.normal(size=(len(lens), d))

    def loss():
        return float((dm * _np_lstm(flat, lens, Wih, Whh, b)).sum())

    _, dWih, dWhh, db, dflat = _np_lstm(flat, lens, Wih, Whh, b, dm=dm)
    eps = 1e-6
    for P, G in ((Wih, dWih), (Whh, dWhh), (b, db), (flat, dflat)):
        it = np.nditer(P, flags=["multi_index"])
        for _ in it:
            ix = it.multi_index
            p0 = P[ix]
            P[ix] = p0 + eps
            lp = loss()
            P[ix] = p0 - eps
            lm = loss()
            P[ix] = p0
            assert abs((lp - lm) / (2 * eps) - G[ix]) < 1e-8
    # degenerate shapes
    assert _np_lstm(np.zeros((0, d)), np.array([], dtype=np.int64),
                    Wih, Whh, b).shape == (0, d)
    assert _np_lstm(flat[:1], np.array([1]), Wih, Whh, b).shape == (1, d)


def _np_lstm_node(seqX, Wih, Whh, b):
    """Naive per-node loop LSTM for the twin — deliberately independent
    of the packed implementation. Returns (h_T, state tape)."""
    d = Whh.shape[0]

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    h = np.zeros(d)
    c = np.zeros(d)
    st = []
    for x in seqX:
        A = x @ Wih + h @ Whh + b
        i_, f_ = sig(A[:d]), sig(A[d:2 * d])
        g_, o_ = np.tanh(A[2 * d:3 * d]), sig(A[3 * d:])
        cp, hp = c, h
        c = f_ * cp + i_ * g_
        tc = np.tanh(c)
        h = o_ * tc
        st.append((x, hp, cp, i_, f_, g_, o_, tc))
    return h, st


def _np_lstm_node_bptt(st, dm, Wih, Whh):
    d = Whh.shape[0]
    dWih = np.zeros_like(Wih)
    dWhh = np.zeros_like(Whh)
    db = np.zeros(4 * d)
    dxs = []
    dh = dm.copy()
    dc = np.zeros(d)
    for x, hp, cp, i_, f_, g_, o_, tc in reversed(st):
        dc = dc + dh * o_ * (1 - tc * tc)
        do = dh * tc
        di, dg, df = dc * g_, dc * i_, dc * cp
        dA = np.concatenate([di * i_ * (1 - i_), df * f_ * (1 - f_),
                             dg * (1 - g_ * g_), do * o_ * (1 - o_)])
        dWih += np.outer(x, dA)
        dWhh += np.outer(hp, dA)
        db += dA
        dxs.append(dA @ Wih.T)
        dh = dA @ Whh.T
        dc = dc * f_
    dxs.reverse()
    return dWih, dWhh, db, dxs


def test_sage_lstm_matches_local_numpy_twin(spark):
    """aggregator='lstm' (DGL SAGEConv): m = the final hidden state of a
    torch-algebra LSTM over the neighbour sequence in pinned
    ascending-id order, z = h@Wr + m@Wn + b. The twin runs a naive
    per-node loop LSTM + BPTT (independent of the distributed packed
    path, whose gradients the finite-difference test above pins) — the
    distributed trainer must reproduce its loss trajectory and learned
    weights to 1e-8."""
    from memgraph_spark.algos.sage import sage_train
    g = _two_cluster_graph(spark)
    rows_df, model = sage_train(g, hidden_sizes=[4], num_epochs=5,
                                learning_rate=0.3, weight_decay=0.0,
                                seed=7, aggregator="lstm")
    rows = rows_df.collect()
    ids, idx, X, y, labeled, train, nbrs = _twin_setup(g)
    n_train = int(train.sum())
    dims = [2, 4, 2]
    rng = np.random.default_rng(7)
    layers = []
    for i in range(2):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        k = 1.0 / np.sqrt(dims[i])
        # rng draw order contract: Wr, Wn, then Wih, Whh, bih, bhh
        layers.append({
            "Wr": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "Wn": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "b": np.zeros(dims[i + 1]),
            "Wih": rng.uniform(-k, k, (dims[i], 4 * dims[i])),
            "Whh": rng.uniform(-k, k, (dims[i], 4 * dims[i])),
            "bih": rng.uniform(-k, k, 4 * dims[i]),
            "bhh": rng.uniform(-k, k, 4 * dims[i])})

    def agg(H, lay, d):
        M = np.zeros((len(ids), d))
        sts = {}
        for n, i in idx.items():
            js = sorted(nbrs.get(n, []))
            if not js:
                sts[i] = ([], [])
                continue
            m, st = _np_lstm_node([H[idx[j]] for j in js], lay["Wih"],
                                  lay["Whh"], lay["bih"] + lay["bhh"])
            M[i] = m
            sts[i] = (js, st)
        return M, sts

    def bptt_all(sts, dM, lay):
        dWih = np.zeros_like(lay["Wih"])
        dWhh = np.zeros_like(lay["Whh"])
        dbl = np.zeros(lay["bih"].shape[0])
        dH = np.zeros((len(ids), lay["Wih"].shape[0]))
        for _n, i in idx.items():
            js, st = sts[i]
            if not js:
                continue
            a, b_, c_, dxs = _np_lstm_node_bptt(st, dM[i], lay["Wih"],
                                                lay["Whh"])
            dWih += a
            dWhh += b_
            dbl += c_
            for j, dx in zip(js, dxs):
                dH[idx[j]] += dx
        return dWih, dWhh, dbl, dH

    losses = []
    for _ in range(5):
        M0, st0 = agg(X, layers[0], 2)
        H1 = np.maximum(X @ layers[0]["Wr"] + M0 @ layers[0]["Wn"]
                        + layers[0]["b"], 0.0)
        M1, st1 = agg(H1, layers[1], 4)
        Z = H1 @ layers[1]["Wr"] + M1 @ layers[1]["Wn"] + layers[1]["b"]
        Zs = Z - Z.max(axis=1, keepdims=True)
        P = np.exp(Zs) / np.exp(Zs).sum(axis=1, keepdims=True)
        yl = np.where(labeled, y, 0)
        logp = np.log(np.clip(P[np.arange(len(y)), yl], 1e-12, None))
        losses.append(-logp[train].mean())
        G = P.copy()
        G[np.arange(len(y)), yl] -= 1.0
        G /= n_train
        G[~train] = 0.0
        dWr2 = H1.T @ G
        dWn2 = M1.T @ G
        db2 = G.sum(axis=0)
        dWih2, dWhh2, dbl2, dH1x = bptt_all(
            st1, G @ layers[1]["Wn"].T, layers[1])
        dH1 = G @ layers[1]["Wr"].T + dH1x
        dH1 *= (H1 > 0)
        dWr1 = X.T @ dH1
        dWn1 = M0.T @ dH1
        db1 = dH1.sum(axis=0)
        dWih1, dWhh1, dbl1, _ = bptt_all(
            st0, dH1 @ layers[0]["Wn"].T, layers[0])
        lr = 0.3
        for lay, gr in zip(layers,
                           [(dWr1, dWn1, db1, dWih1, dWhh1, dbl1),
                            (dWr2, dWn2, db2, dWih2, dWhh2, dbl2)]):
            dWr, dWn, db_, dWih, dWhh, dbl = gr
            lay["Wr"] -= lr * dWr
            lay["Wn"] -= lr * dWn
            lay["b"] -= lr * db_
            lay["Wih"] -= lr * dWih
            lay["Whh"] -= lr * dWhh
            lay["bih"] -= lr * dbl
            lay["bhh"] -= lr * dbl
    for r, lo in zip(rows, losses):
        assert r.loss == pytest.approx(float(lo), abs=1e-8), \
            f"epoch {r.epoch}: {r.loss} vs local {lo}"
    assert np.allclose(np.array(model["layers"][0]["Wih"]),
                       layers[0]["Wih"], atol=1e-8)
    assert np.allclose(np.array(model["layers"][1]["Whh"]),
                       layers[1]["Whh"], atol=1e-8)
