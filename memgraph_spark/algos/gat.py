"""Distributed no-torch GAT for node_classification (layer_type GAT,
single head).

Parity target: the reference's GAT path —
mage/node_classification/models/gat.py wraps PyG GATConv layers through
inductive_model.py with GATConv's defaults (heads=1,
add_self_loops=True, negative_slope=0.2). Single-head GATConv computes,
for each edge j -> i (self-loops included):

    u = h @ W                       (lin, no bias)
    e_ij = LeakyReLU(a_src . u_j + a_dst . u_i)
    alpha_ij = softmax_j(e_ij)      (per destination i)
    out_i = sum_j alpha_ij u_j + b

relu between layers, softmax cross-entropy on top. GATv2 swaps the
attention formula (a . LeakyReLU(W_s h_j + W_d h_i), algos/gatv2.py);
GATJK adds 3-head attention + JumpingKnowledge (algos/gatjk.py) —
both now train without torch too.

Same execution model as algos/sage.py: per-node states are
(id, array<double>) frames, per-edge attention lives in an
(src, dst, alpha) frame (never materializing edge x dim rows except
inside algebraic posexplode aggregations), matmuls are Arrow-batched
mapInPandas, weight/attention gradients reduce via treeAggregate.
Deviations documented in sage.py apply here too (no BatchNorm/dropout;
full-batch deterministic GD with explicit L2 weight decay).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.algos.sage import _np_rows
from memgraph_spark.session import free_checkpoint

NEG_SLOPE = 0.2


def _dot(a, b):
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _map_u(h: DataFrame, W, a_src, a_dst) -> DataFrame:
    """(id, h) -> (id, u=h@W, ssrc=u.a_src, sdst=u.a_dst)."""
    import pandas as pd
    W_ = np.asarray(W, dtype=np.float64)
    asrc_ = np.asarray(a_src, dtype=np.float64)
    adst_ = np.asarray(a_dst, dtype=np.float64)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            U = _np_rows(pdf["h"]) @ W_
            yield pd.DataFrame({"id": pdf["id"], "u": list(U),
                                "ssrc": U @ asrc_, "sdst": U @ adst_})

    return h.mapInPandas(
        fn, "id long, u array<double>, ssrc double, sdst double")


def _attention(adj_self: DataFrame, uf: DataFrame) -> DataFrame:
    """(src, dst, alpha, pos_pre): per-edge softmax attention over each
    destination's in-neighbourhood. pos_pre carries LeakyReLU' for
    backward (1.0 where the pre-activation was positive, NEG_SLOPE
    elsewhere)."""
    e = (adj_self
         .join(uf.select(F.col("id").alias("src"),
                         F.col("ssrc").alias("sj")), "src")
         .join(uf.select(F.col("id").alias("dst"),
                         F.col("sdst").alias("si")), "dst")
         .select("src", "dst", (F.col("sj") + F.col("si")).alias("pre")))
    e = e.select(
        "src", "dst",
        F.when(F.col("pre") > 0, F.col("pre"))
        .otherwise(F.col("pre") * NEG_SLOPE).alias("e"),
        F.when(F.col("pre") > 0, F.lit(1.0))
        .otherwise(F.lit(NEG_SLOPE)).alias("pos_pre"))
    mx = e.groupBy("dst").agg(F.max("e").alias("mx"))
    e = (e.join(mx, "dst")
         .select("src", "dst", "pos_pre",
                 F.exp(F.col("e") - F.col("mx")).alias("ex")))
    sm = e.groupBy("dst").agg(F.sum("ex").alias("z"))
    return (e.join(sm, "dst")
            .select("src", "dst", "pos_pre",
                    (F.col("ex") / F.col("z")).alias("alpha")))


def _weighted_gather(att: DataFrame, uf: DataFrame,
                     weight_col: str = "alpha",
                     from_col: str = "src",
                     to_col: str = "dst") -> DataFrame:
    """(id, v): sum over edges of weight * u[from] grouped by `to` —
    posexplode + sum, algebraic (partial-aggregated, skew-immune)."""
    rows = (att.join(uf.select(F.col("id").alias(from_col), "u"),
                     from_col)
            .select(F.col(to_col).alias("id"), weight_col,
                    F.posexplode("u").alias("pos", "x"))
            .groupBy("id", "pos")
            .agg(F.sum(F.col(weight_col) * F.col("x")).alias("v"))
            .groupBy("id").agg(
                F.transform(F.array_sort(F.collect_list(
                    F.struct("pos", "v"))),
                    lambda s: s.getField("v")).alias("v")))
    return rows


def _vec_grads(joined: DataFrame, left: str, right: str, dim: int):
    """treeAggregate of sum(scalar_left * vec_right) -> dim floats."""
    def part(rows):
        acc = np.zeros(dim)
        any_row = False
        for r in rows:
            any_row = True
            acc += float(r[left]) * np.asarray(r[right], dtype=np.float64)
        return iter([acc]) if any_row else iter(())

    return joined.select(left, right).rdd.mapPartitions(part) \
        .treeAggregate(np.zeros(dim), lambda a, b: a + b,
                       lambda a, b: a + b)


def _mat_grad(joined: DataFrame, d_in: int, d_out: int):
    """treeAggregate of sum(outer(h, g)) over (h, g) rows."""
    def part(rows):
        acc = np.zeros((d_in, d_out))
        any_row = False
        for r in rows:
            any_row = True
            acc += np.outer(np.asarray(r["h"], dtype=np.float64),
                            np.asarray(r["g"], dtype=np.float64))
        return iter([acc]) if any_row else iter(())

    return joined.select("h", "g").rdd.mapPartitions(part) \
        .treeAggregate(np.zeros((d_in, d_out)), lambda a, b: a + b,
                       lambda a, b: a + b)


class _GatLayerState:
    """Per-epoch persisted frames one GAT layer needs for backward."""

    def __init__(self, h_in, uf, att, out):
        self.h_in = h_in        # (id, h) input (post-relu of prev layer)
        self.uf = uf            # (id, u, ssrc, sdst)
        self.att = att          # (src, dst, alpha, pos_pre)
        self.out = out          # (id, h) = relu'd output (or logits)


def _gat_forward_layer(h: DataFrame, adj_self: DataFrame, lay: dict,
                       dim_out: int, relu: bool) -> _GatLayerState:
    import pandas as pd
    # localCheckpoint, not persist: the attention/backward plans are deep
    # enough that carrying full lineage into every downstream join blows
    # driver heap on plan compilation; checkpoints truncate to RDD scans
    uf = _map_u(h, lay["W"], lay["a_src"], lay["a_dst"]) \
        .localCheckpoint(eager=True)
    att = _attention(adj_self, uf).localCheckpoint(eager=True)
    agg = _weighted_gather(att, uf)
    b_ = np.asarray(lay["b"], dtype=np.float64)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Z = _np_rows(pdf["v"]) + b_
            if relu:
                np.maximum(Z, 0.0, out=Z)
            yield pd.DataFrame({"id": pdf["id"], "h": list(Z)})

    out = agg.mapInPandas(fn, "id long, h array<double>") \
        .localCheckpoint(eager=True)
    return _GatLayerState(h, uf, att, out)


def _gat_backward_layer(st: _GatLayerState, g: DataFrame, lay: dict,
                        d_in: int, d_out: int, need_dh: bool,
                        act: str | None = "relu", need_db: bool = True):
    """Returns (dW, da_src, da_dst, db, dh_frame|None). `g` is
    (id, g array) = dL/d(pre-bias aggregation output). `act` names the
    activation the INPUT frame h_in went through, so dh carries its
    derivative: "relu" (default, this module's trainer), or None when
    the caller handles the activation itself (GATJK routes ELU + the
    jumping-knowledge gradient outside the per-head backward). Callers
    that compute the conv bias gradient themselves (GATJK sums graw
    once across heads) pass need_db=False to skip the per-head bias
    aggregation job; db is then returned as None."""
    import pandas as pd
    if need_db:
        db = np.asarray(
            g.select(F.posexplode("g").alias("pos", "x"))
            .groupBy("pos").agg(F.sum("x").alias("s"))
            .orderBy("pos").select("s").rdd
            .map(lambda r: r["s"]).collect(), dtype=np.float64)
        if db.shape != (d_out,):      # no gradient rows at all
            db = np.zeros(d_out)
    else:
        db = None
    # edge-level attention gradient: dalpha_ij = g_i . u_j
    gsel = g.select(F.col("id").alias("dst"), F.col("g"))
    usel = st.uf.select(F.col("id").alias("src"), "u")
    edge = (st.att.join(gsel, "dst").join(usel, "src")
            .select("src", "dst", "alpha", "pos_pre",
                    _dot(F.col("g"), F.col("u")).alias("dal")))
    s_i = edge.groupBy("dst").agg(
        F.sum(F.col("alpha") * F.col("dal")).alias("S"))
    edge = (edge.join(s_i, "dst")
            .select("src", "dst", "alpha",
                    (F.col("alpha") * (F.col("dal") - F.col("S"))
                     * F.col("pos_pre")).alias("dpre"))) \
        .localCheckpoint(eager=True)
    ds_src = edge.groupBy("src").agg(F.sum("dpre").alias("ds"))
    ds_dst = edge.groupBy("dst").agg(F.sum("dpre").alias("ds"))
    # attention-vector gradients: da_src = sum_j ds_src[j] u_j, etc.
    da_src = _vec_grads(
        ds_src.join(st.uf.select(F.col("id").alias("src"), "u"), "src"),
        "ds", "u", d_out)
    da_dst = _vec_grads(
        ds_dst.join(st.uf.select(F.col("id").alias("dst"), "u"), "dst"),
        "ds", "u", d_out)
    # dU = value path (alpha-weighted scatter of g_i back to each source
    # j) + attention paths ds_src*a_src + ds_dst*a_dst
    val = (edge.select("src", "dst", "alpha").join(gsel, "dst")
           .select(F.col("src").alias("id"), "alpha",
                   F.posexplode("g").alias("pos", "x"))
           .groupBy("id", "pos")
           .agg(F.sum(F.col("alpha") * F.col("x")).alias("v"))
           .groupBy("id").agg(
               F.transform(F.array_sort(F.collect_list(
                   F.struct("pos", "v"))),
                   lambda s: s.getField("v")).alias("val")))
    asrc_ = np.asarray(lay["a_src"], dtype=np.float64)
    adst_ = np.asarray(lay["a_dst"], dtype=np.float64)
    zeros = F.array_repeat(F.lit(0.0), d_out)
    du_in = (st.uf.select("id")
             .join(val, "id", "left")
             .join(ds_src.select(F.col("src").alias("id"),
                                 F.col("ds").alias("dss")), "id", "left")
             .join(ds_dst.select(F.col("dst").alias("id"),
                                 F.col("ds").alias("dsd")), "id", "left")
             .select("id", F.coalesce("val", zeros).alias("val"),
                     F.coalesce("dss", F.lit(0.0)).alias("dss"),
                     F.coalesce("dsd", F.lit(0.0)).alias("dsd")))

    def du_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            DU = (_np_rows(pdf["val"])
                  + pdf["dss"].to_numpy()[:, None] * asrc_
                  + pdf["dsd"].to_numpy()[:, None] * adst_)
            yield pd.DataFrame({"id": pdf["id"], "g": list(DU)})

    du = du_in.mapInPandas(du_fn, "id long, g array<double>") \
        .localCheckpoint(eager=True)
    dW = _mat_grad(st.h_in.join(du, "id"), d_in, d_out)
    dh = None
    if need_dh:
        W_t = np.asarray(lay["W"], dtype=np.float64).T

        def dh_fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                DH = _np_rows(pdf["g"]) @ W_t
                if act == "relu":
                    DH *= (_np_rows(pdf["h"]) > 0.0)  # relu' of h_in
                yield pd.DataFrame({"id": pdf["id"], "g": list(DH)})

        dh = (st.h_in.join(du, "id")
              .mapInPandas(dh_fn, "id long, g array<double>")) \
            .localCheckpoint(eager=True)
    free_checkpoint(edge)
    free_checkpoint(du)
    return dW, da_src, da_dst, db, dh


def gat_train(graph, hidden_sizes=None, num_epochs: int = 100,
              learning_rate: float = 0.1, weight_decay: float = 5e-4,
              split_ratio: float = 0.8, features_attr: str = "features",
              label_attr: str = "class", etype: str | None = None,
              seed: int = 1):
    """Trains the single-head GAT stack; returns (epoch_rows, model)."""
    import pandas as pd
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
    labeled = (nodes.filter(F.col("y").isNotNull())
               .withColumn("yi", cmap[F.col("y")].cast("int"))
               .withColumn("train",
                           F.pmod(F.xxhash64("id"), 1000)
                           < int(split_ratio * 1000)))
    # undirected adjacency + self-loops (GATConv add_self_loops default)
    und = graph.adjacency(etype, "both").select("src", "dst")
    adj_self = und.unionByName(
        nodes.select(F.col("id").alias("src"),
                     F.col("id").alias("dst"))).persist()
    adj_self.count()
    X = nodes.select("id", "h").persist()
    meta = labeled.select("id", "yi", "train").persist()
    counts = meta.agg(
        F.sum(F.when(F.col("train"), 1).otherwise(0)).alias("tr")).first()
    n_train = int(counts["tr"] or 0)

    dims = [d0] + hidden_sizes + [k]
    rng = np.random.default_rng(seed)
    layers = []
    for i in range(len(dims) - 1):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        lim_a = np.sqrt(6.0 / (dims[i + 1] + 1))
        layers.append({
            "W": rng.uniform(-lim, lim, (dims[i], dims[i + 1])),
            "a_src": rng.uniform(-lim_a, lim_a, dims[i + 1]),
            "a_dst": rng.uniform(-lim_a, lim_a, dims[i + 1]),
            "b": np.zeros(dims[i + 1])})
    L = len(layers)
    from memgraph_spark.algos.sage import _softmax_grad_frame
    rows = []
    for epoch in range(1, int(num_epochs) + 1):
        states = []
        cur = X
        for li, lay in enumerate(layers):
            st = _gat_forward_layer(cur, adj_self, lay, dims[li + 1],
                                    relu=(li < L - 1))
            states.append(st)
            cur = st.out
        zl = (states[-1].out.join(meta, "id")
              .select("id", "h", "yi", "train"))
        gframe = _softmax_grad_frame(zl, k, n_train) \
            .localCheckpoint(eager=True)
        m = gframe.agg(
            F.avg(F.when(F.col("is_train"), F.col("loss"))).alias("lo"),
            F.avg(F.when(~F.col("is_train"), F.col("loss"))).alias("vlo"),
            F.avg(F.when(F.col("is_train"), F.col("hit"))).alias("acc"),
            F.avg(F.when(~F.col("is_train"), F.col("hit"))).alias("vacc")
        ).first()
        rows.append((epoch, float(m["lo"] or 0.0), float(m["vlo"] or 0.0),
                     [float(m["acc"] or 0.0)], [float(m["vacc"] or 0.0)]))
        g = gframe.select("id", "g")
        grads = []
        extra = [gframe]
        for li in range(L - 1, -1, -1):
            dW, das, dad, db, dh = _gat_backward_layer(
                states[li], g, layers[li], dims[li], dims[li + 1],
                need_dh=(li > 0))
            grads.append((dW, das, dad, db))
            if dh is not None:
                extra.append(dh)
                g = dh
        grads.reverse()
        lr, wd = learning_rate, weight_decay
        for lay, (dW, das, dad, db) in zip(layers, grads):
            lay["W"] -= lr * (dW + wd * lay["W"])
            lay["a_src"] -= lr * (das + wd * lay["a_src"])
            lay["a_dst"] -= lr * (dad + wd * lay["a_dst"])
            lay["b"] -= lr * db
        for st in states:
            free_checkpoint(st.uf)
            free_checkpoint(st.att)
            free_checkpoint(st.out)
        for fr in extra:
            free_checkpoint(fr)
    out_schema = ("epoch int, loss double, val_loss double, "
                  "train_log array<double>, val_log array<double>")
    model = {"kind": "gat", "classes": classes,
             "layers": [{"W": lay["W"].tolist(),
                         "a_src": lay["a_src"].tolist(),
                         "a_dst": lay["a_dst"].tolist(),
                         "b": lay["b"].tolist()} for lay in layers],
             "features_attr": features_attr, "label_attr": label_attr,
             "etype": etype, "d0": d0}
    for fr in (X, meta, adj_self):
        fr.unpersist()
    return spark.createDataFrame(rows, out_schema), model


def gat_forward(graph, model) -> DataFrame:
    """(id, h=z_L): the trained stack over the whole graph."""
    feat = F.col(model["features_attr"]).cast("array<double>")
    nodes = (graph.all_nodes([model["features_attr"]])
             .select("id", feat.alias("h"))
             .filter(F.col("h").isNotNull())
             .filter(F.size("h") == int(model["d0"])))
    und = graph.adjacency(model["etype"], "both").select("src", "dst")
    adj_self = und.unionByName(
        nodes.select(F.col("id").alias("src"), F.col("id").alias("dst")))
    cur = nodes
    L = len(model["layers"])
    dims_out = [len(lay["b"]) for lay in model["layers"]]
    for li, lay in enumerate(model["layers"]):
        st = _gat_forward_layer(cur, adj_self, lay, dims_out[li],
                                relu=(li < L - 1))
        free_checkpoint(st.uf)
        free_checkpoint(st.att)
        if li > 0:
            free_checkpoint(cur)     # previous layer's checkpointed out
        cur = st.out
    return cur
