"""Distributed no-torch GraphSAGE for node_classification (layer_type
SAGE, aggr mean or max).

Parity target: the reference's deep path —
src/mage/python/mage/node_classification/models/sage.py wrapping PyG
SAGEConv layers inside inductive_model.py. PyG SAGEConv with mean
aggregation computes  z_i = h_i @ Wr + mean_{j in N(i)} h_j @ Wn + b
(aggr='max' swaps the mean for an elementwise max over neighbour
features, backward routed to the argmax contributor),
with relu between layers and softmax cross-entropy on top
(train_model.py). The reference gates this behind `import torch`; this
module trains the SAME layer algebra with numpy + DataFrames, so SAGE
runs in environments without torch. GAT/GATv2/GATJK (attention layers,
algos/gat.py / gatv2.py / gatjk.py) train without torch the same way.

Documented deviations from the torch path (regularization, not layer
algebra): no BatchNorm1d or dropout(0.5) between layers — this is
deterministic full-batch gradient descent with explicit L2 weight_decay
(the reference uses Adam + those stochastic regularizers). Undirected
(both-direction) neighbourhood, matching the repo's baseline and the
reference's usual undirected social inputs.

Execution model (nothing large on the driver):
- node states are (id, array<double>) frames; the mean-neighbour
  aggregation is posexplode + avg — algebraic, partial-aggregated,
  skew-immune;
- matmuls run in Arrow-batched pandas form via mapInPandas with the
  small weight matrices in the task closure;
- weight gradients reduce via mapPartitions + treeAggregate (the
  node2vec trainer's established pattern): the driver holds only the
  O(sum d_l*d_{l+1}) parameter/gradient floats;
- the neighbour half of backprop is the transpose of the forward mean:
  each node scatters g_i @ Wn^T / deg_i to its neighbours through the
  same adjacency join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mean_neighbor(adj: DataFrame, h: DataFrame, dim: int) -> DataFrame:
    """(id, m): mean of neighbours' h over the (src, dst) adjacency,
    zeros for isolated nodes (PyG SAGEConv aggregates an empty
    neighbourhood to 0)."""
    nb = (adj.join(h.select(F.col("id").alias("dst"),
                            F.col("h").alias("nh")), "dst")
          .select(F.col("src").alias("id"),
                  F.posexplode("nh").alias("pos", "v"))
          .groupBy("id", "pos").agg(F.avg("v").alias("v"))
          .groupBy("id").agg(
              F.transform(F.array_sort(F.collect_list(
                  F.struct("pos", "v"))),
                  lambda s: s.getField("v")).alias("m")))
    zeros = F.array_repeat(F.lit(0.0), dim)
    return (h.select("id").join(nb, "id", "left")
            .select("id", F.coalesce("m", zeros).alias("m")))


def _max_neighbor(adj: DataFrame, h: DataFrame, dim: int):
    """(m_frame, arg_frame) for PyG SAGEConv aggr='max': m = elementwise
    max over neighbours' h (zeros for isolated nodes, matching the mean
    path's empty-neighbourhood choice); arg_frame = (id, pos, am) names
    the contributing neighbour per position — max-pooling backprop
    routes the gradient to exactly that contributor. Ties break to the
    largest neighbour id (deterministic on both the distributed and the
    local-twin side)."""
    nb = (adj.join(h.select(F.col("id").alias("dst"),
                            F.col("h").alias("nh")), "dst")
          .select(F.col("src").alias("id"), F.col("dst").alias("j"),
                  F.posexplode("nh").alias("pos", "v"))
          .groupBy("id", "pos")
          .agg(F.max("v").alias("v"),
               F.max_by("j", F.struct("v", "j")).alias("am")))
    m = (nb.groupBy("id").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s.getField("v")).alias("m")))
    zeros = F.array_repeat(F.lit(0.0), dim)
    m = (h.select("id").join(m, "id", "left")
         .select("id", F.coalesce("m", zeros).alias("m")))
    return m, nb.select("id", "pos", "am")


def _np_rows(col):
    """Column of array<double> (pandas Series of lists) -> 2-D ndarray."""
    return np.array(col.to_list(), dtype=np.float64)


def _sage_layer(joined: DataFrame, Wr, Wn, b, relu: bool,
                extra_cols=()) -> DataFrame:
    """(id, h, m[, extra...]) -> (id, h=z[, extra...]) with
    z = h@Wr + m@Wn + b, relu'd between layers. Arrow-batched."""
    import pandas as pd
    Wr_, Wn_, b_ = (np.asarray(Wr, dtype=np.float64),
                    np.asarray(Wn, dtype=np.float64),
                    np.asarray(b, dtype=np.float64))
    out_fields = "id long, h array<double>" + "".join(
        f", {c} {t}" for c, t in extra_cols)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Z = _np_rows(pdf["h"]) @ Wr_ + _np_rows(pdf["m"]) @ Wn_ + b_
            if relu:
                np.maximum(Z, 0.0, out=Z)
            out = {"id": pdf["id"], "h": list(Z)}
            for c, _t in extra_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return joined.mapInPandas(fn, out_fields)


def _softmax_grad_frame(zframe: DataFrame, k: int,
                        n_train: int) -> DataFrame:
    """(id, h=z_L, yi, train) -> (id, g, loss, hit, is_train): per-node
    cross-entropy gradient rows (g = (softmax - onehot)/n_train on train
    nodes, 0 elsewhere) plus per-node metrics."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Z = _np_rows(pdf["h"])
            Z = Z - Z.max(axis=1, keepdims=True)
            E = np.exp(Z)
            P = E / E.sum(axis=1, keepdims=True)
            y = pdf["yi"].to_numpy()
            tr = pdf["train"].to_numpy().astype(bool)
            G = P.copy()
            G[np.arange(len(y)), y] -= 1.0
            G /= max(n_train, 1)
            G[~tr] = 0.0
            logp = np.log(np.clip(P[np.arange(len(y)), y], 1e-12, None))
            hit = (P.argmax(axis=1) == y).astype(np.float64)
            yield pd.DataFrame({"id": pdf["id"], "g": list(G),
                                "loss": -logp, "hit": hit,
                                "is_train": tr})

    return zframe.mapInPandas(
        fn, "id long, g array<double>, loss double, hit double, "
            "is_train boolean")


def _weight_grads(joined: DataFrame, d_in: int, d_out: int):
    """treeAggregate of (dWr, dWn, db) over (h, m, g) rows — only
    d_in x d_out floats reach the driver."""
    def part(rows):
        dWr = np.zeros((d_in, d_out))
        dWn = np.zeros((d_in, d_out))
        db = np.zeros(d_out)
        any_row = False
        for r in rows:
            any_row = True
            g = np.asarray(r["g"], dtype=np.float64)
            dWr += np.outer(np.asarray(r["h"], dtype=np.float64), g)
            dWn += np.outer(np.asarray(r["m"], dtype=np.float64), g)
            db += g
        return iter([(dWr, dWn, db)]) if any_row else iter(())

    zero = (np.zeros((d_in, d_out)), np.zeros((d_in, d_out)),
            np.zeros(d_out))
    return joined.select("h", "m", "g").rdd.mapPartitions(part) \
        .treeAggregate(zero,
                       lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
                       lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]))


def _backprop_to_prev(gframe: DataFrame, hprev: DataFrame,
                      adj: DataFrame, deg: DataFrame, Wr, Wn,
                      d_prev: int, arg: DataFrame | None = None
                      ) -> DataFrame:
    """dH_prev = (G @ Wr^T + scatter(G @ Wn^T)) * relu'(H_prev).

    mean (arg is None): the scatter is the transpose of the forward
    mean — node i contributed 1/deg_i of each neighbour j's state to
    its own m_i, so j receives (g_i @ Wn^T)/deg_i from every i it
    neighbours.

    max (arg = the forward's (id, pos, am) argmax frame): max-pooling
    is locally an indicator — only the contributing neighbour am(i,pos)
    receives (g_i @ Wn^T)[pos]; everyone else gets zero."""
    import pandas as pd
    Wr_t = np.asarray(Wr, dtype=np.float64).T
    Wn_t = np.asarray(Wn, dtype=np.float64).T

    def own_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame({"id": pdf["id"],
                                "own": list(_np_rows(pdf["g"]) @ Wr_t)})

    own = gframe.mapInPandas(own_fn, "id long, own array<double>")

    if arg is None:
        def msg_fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                M = (_np_rows(pdf["g"]) @ Wn_t) \
                    / pdf["deg"].to_numpy()[:, None]
                yield pd.DataFrame({"id": pdf["id"], "msg": list(M)})

        msgs = gframe.join(deg, "id").mapInPandas(
            msg_fn, "id long, msg array<double>")
        # scatter: i's message reaches every j adjacent to i (adj is
        # (src=i, dst=j) oriented); posexplode + sum = algebraic
        nbr = (adj.join(msgs.select(F.col("id").alias("src"), "msg"),
                        "src")
               .select(F.col("dst").alias("id"),
                       F.posexplode("msg").alias("pos", "v"))
               .groupBy("id", "pos").agg(F.sum("v").alias("v"))
               .groupBy("id").agg(
                   F.transform(F.array_sort(F.collect_list(
                       F.struct("pos", "v"))),
                       lambda s: s.getField("v")).alias("nbr")))
    else:
        def msg_fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                M = _np_rows(pdf["g"]) @ Wn_t
                yield pd.DataFrame({"id": pdf["id"], "msg": list(M)})

        msgs = gframe.mapInPandas(msg_fn, "id long, msg array<double>")
        # route (i, pos) to its argmax contributor; positions a node
        # never won arrive sparse, so densify through a pos->v map
        nbr = (msgs.select("id", F.posexplode("msg").alias("pos", "v"))
               .join(arg, ["id", "pos"])
               .groupBy(F.col("am").alias("id"), F.col("pos"))
               .agg(F.sum("v").alias("v"))
               .groupBy("id").agg(
                   F.map_from_entries(F.collect_list(
                       F.struct("pos", "v"))).alias("mp"))
               .select("id", F.transform(
                   F.sequence(F.lit(0), F.lit(d_prev - 1)),
                   lambda i: F.coalesce(
                       F.element_at("mp", i.cast("int")), F.lit(0.0)))
                   .alias("nbr")))
    zeros = F.array_repeat(F.lit(0.0), d_prev)
    joined = (hprev.join(own, "id", "left").join(nbr, "id", "left")
              .select("id", "h",
                      F.coalesce("own", zeros).alias("own"),
                      F.coalesce("nbr", zeros).alias("nbr")))

    def mask_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            G = _np_rows(pdf["own"]) + _np_rows(pdf["nbr"])
            G *= (_np_rows(pdf["h"]) > 0.0)        # relu'
            yield pd.DataFrame({"id": pdf["id"], "g": list(G)})

    return joined.mapInPandas(mask_fn, "id long, g array<double>")


def sage_train(graph, hidden_sizes=None, num_epochs: int = 100,
               learning_rate: float = 0.1, weight_decay: float = 5e-4,
               split_ratio: float = 0.8, features_attr: str = "features",
               label_attr: str = "class", etype: str | None = None,
               seed: int = 1, aggregator: str = "mean"):
    """Trains the SAGE stack; returns (epoch_rows, model dict).

    epoch_rows match node_classification.train's record shape
    (epoch, loss, val_loss, train_log=[acc], val_log=[acc]); the model
    dict carries per-layer (Wr, Wn, b) for predict. `aggregator` is the
    PyG SAGEConv aggr: 'mean' or 'max' (max pools neighbour features
    elementwise; its backward routes each position's gradient to the
    argmax contributor)."""
    aggregator = str(aggregator).lower()
    if aggregator not in ("mean", "max"):
        raise NotImplementedError(
            f"SAGE aggregator {aggregator!r}: only 'mean' and 'max' run "
            "without torch (reference SAGEConv aggr)")
    hidden_sizes = list(hidden_sizes or [16, 16])
    spark = graph.spark
    feat = F.col(features_attr).cast("array<double>")
    nodes = (graph.all_nodes([features_attr, label_attr])
             .select("id", feat.alias("h"),
                     F.col(label_attr).cast("long").alias("y"))
             .filter(F.col("h").isNotNull()))
    probe = nodes.select(F.size("h").alias("d")).filter("d > 0").first()
    if probe is None:
        raise ValueError(
            f"node_classification.train: no node carries a non-empty "
            f"'{features_attr}' array property")
    d0 = int(probe["d"])
    nodes = nodes.filter(F.size("h") == d0)
    classes = [int(r["y"]) for r in nodes.filter(F.col("y").isNotNull())
               .select("y").distinct().orderBy("y").collect()]
    if not classes:
        raise ValueError(
            f"node_classification.train: no node carries the "
            f"'{label_attr}' property")
    k = len(classes)
    cmap = F.create_map(*[x for c, i in
                          ((F.lit(c), F.lit(i))
                           for i, c in enumerate(classes)) for x in (c, i)])
    # labeled design frame with a deterministic split (same scheme as the
    # baseline trainer: stable across epochs and runs)
    labeled = (nodes.filter(F.col("y").isNotNull())
               .withColumn("yi", cmap[F.col("y")].cast("int"))
               .withColumn("train",
                           F.pmod(F.xxhash64("id"), 1000)
                           < int(split_ratio * 1000)))
    adj = graph.adjacency(etype, "both").select("src", "dst")
    deg = (adj.groupBy(F.col("src").alias("id"))
           .agg(F.count("*").cast("double").alias("deg")))

    X = nodes.select("id", "h").persist()
    meta = labeled.select("id", "yi", "train").persist()
    counts = meta.agg(
        F.sum(F.when(F.col("train"), 1).otherwise(0)).alias("tr"),
        F.count("*").alias("n")).first()
    n_train = int(counts["tr"] or 0)
    use_max = aggregator == "max"
    A0 = None
    if use_max:
        M0, A0 = _max_neighbor(adj, X, d0)
        M0, A0 = M0.persist(), A0.persist()
        A0.count()
    else:
        M0 = _mean_neighbor(adj, X, d0).persist()
    X0 = X.join(M0, "id").persist()
    X0.count()

    dims = [d0] + hidden_sizes + [k]
    rng = np.random.default_rng(seed)
    layers = []
    for i in range(len(dims) - 1):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))   # Glorot uniform
        layers.append({
            "Wr": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "Wn": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "b": np.zeros(dims[i + 1])})
    L = len(layers)
    rows = []
    for epoch in range(1, int(num_epochs) + 1):
        # ---- forward: persist each layer's (id, h, m) input frame
        # (plus, for max aggregation, the per-layer argmax routing frame
        # the backward scatter joins on)
        inputs = [X0]                    # layer l consumes inputs[l]
        args = [A0]
        cleanup = []
        cur = X0
        for li, lay in enumerate(layers[:-1]):
            h_next = _sage_layer(cur, lay["Wr"], lay["Wn"], lay["b"],
                                 relu=True)
            if use_max:
                m_next, a_next = _max_neighbor(adj, h_next,
                                               dims[li + 1])
                a_next = a_next.persist()
                cleanup.append(a_next)
                args.append(a_next)
            else:
                m_next = _mean_neighbor(adj, h_next, dims[li + 1])
                args.append(None)
            cur = h_next.join(m_next, "id").persist()
            cur.count()
            cleanup.append(cur)
            inputs.append(cur)
        zL = _sage_layer(
            inputs[-1].join(meta, "id"),
            layers[-1]["Wr"], layers[-1]["Wn"], layers[-1]["b"],
            relu=False, extra_cols=(("yi", "int"), ("train", "boolean")))
        gframe = _softmax_grad_frame(zL, k, n_train).persist()
        m = gframe.agg(
            F.avg(F.when(F.col("is_train"), F.col("loss"))).alias("lo"),
            F.avg(F.when(~F.col("is_train"), F.col("loss"))).alias("vlo"),
            F.avg(F.when(F.col("is_train"), F.col("hit"))).alias("acc"),
            F.avg(F.when(~F.col("is_train"), F.col("hit"))).alias("vacc")
        ).first()
        rows.append((epoch, float(m["lo"] or 0.0), float(m["vlo"] or 0.0),
                     [float(m["acc"] or 0.0)], [float(m["vacc"] or 0.0)]))
        # ---- backward
        g = gframe.select("id", "g")
        grads = []
        for li in range(L - 1, -1, -1):
            joined = inputs[li].join(g, "id")
            grads.append(_weight_grads(joined, dims[li], dims[li + 1]))
            if li > 0:
                nxt = _backprop_to_prev(
                    g, inputs[li].select("id", "h"), adj, deg,
                    layers[li]["Wr"], layers[li]["Wn"],
                    dims[li], arg=args[li]).persist()
                nxt.count()
                cleanup.append(nxt)
                g = nxt
        grads.reverse()
        for lay, (dWr, dWn, db) in zip(layers, grads):
            lay["Wr"] -= learning_rate * (dWr + weight_decay * lay["Wr"])
            lay["Wn"] -= learning_rate * (dWn + weight_decay * lay["Wn"])
            lay["b"] -= learning_rate * db
        gframe.unpersist()
        for fr in cleanup:
            fr.unpersist()
    out_schema = ("epoch int, loss double, val_loss double, "
                  "train_log array<double>, val_log array<double>")
    model = {"kind": "sage", "classes": classes,
             "layers": [{"Wr": lay["Wr"].tolist(),
                         "Wn": lay["Wn"].tolist(),
                         "b": lay["b"].tolist()} for lay in layers],
             "features_attr": features_attr, "label_attr": label_attr,
             "etype": etype, "d0": d0, "aggregator": aggregator}
    for fr in (X, meta, M0, X0):
        fr.unpersist()
    if A0 is not None:
        A0.unpersist()
    return spark.createDataFrame(rows, out_schema), model


def sage_forward(graph, model) -> DataFrame:
    """(id, h=z_L): run the trained stack over the whole graph — the
    reference's predict also evaluates model(x, edge_index) on the full
    graph (train_model.py)."""
    feat = F.col(model["features_attr"]).cast("array<double>")
    nodes = (graph.all_nodes([model["features_attr"]])
             .select("id", feat.alias("h"))
             .filter(F.col("h").isNotNull())
             .filter(F.size("h") == int(model["d0"])))
    adj = graph.adjacency(model["etype"], "both").select("src", "dst")
    cur = nodes
    dims = [int(model["d0"])] + [len(lay["b"]) for lay in model["layers"]]
    use_max = model.get("aggregator", "mean") == "max"
    for li, lay in enumerate(model["layers"]):
        if use_max:
            m, _arg = _max_neighbor(adj, cur, dims[li])
        else:
            m = _mean_neighbor(adj, cur, dims[li])
        cur = _sage_layer(cur.join(m, "id"), lay["Wr"], lay["Wn"],
                          lay["b"], relu=(li < len(model["layers"]) - 1))
    return cur
