"""GNN / TGN link prediction: torch-gated deep path + a real CPU baseline.

Parity targets: the reference's deep-learning modules —
link_prediction GNN (src/mage/python/link_prediction.py),
node_classification (src/mage/python/node_classification.py),
temporal graph networks (src/mage/python/tgn.py), embeddings
(src/mage/python/embeddings.py + embed_worker).

Every reference model now trains for REAL without torch:
node_classification's deep path dispatches to algos/sage.py (SAGE
mean/max/pool/gcn) and algos/gat*.py (GAT/GATv2/GATJK), TGN to
algos/tgn_deep.py, and link_prediction's deep path (the reference
default, graph_attn/graph_sage encoder + MLP/dot predictor) to
algos/linkpred_deep.py. This module keeps the shared no-torch surfaces:
the logistic-regression-over-neighbourhood-features baseline
(common neighbours, Adamic-Adar, Jaccard, preferential attachment) —
now ONLY the documented layer_type='logistic' fallback for
link_prediction — plus the node-classification softmax baseline.
Feature extraction and scoring are pure DataFrame aggregations;
training is distributed batch gradient descent — each iteration is ONE
aggregation job producing the 5-float gradient, so the driver holds
only the weight vector, never the pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - torch is absent in the build environment
    import torch  # noqa: F401
    _HAS_TORCH = True
except ImportError:
    _HAS_TORCH = False

_FEATURES = ["cn", "aa", "jac", "pa"]


def _require_torch(feature: str):
    if not _HAS_TORCH:
        raise NotImplementedError(
            f"{feature} requires torch (reference gates the same way on its "
            "`import torch`); the reference layer types train without it "
            "via algos/sage.py / gat*.py / linkpred_deep.py / tgn_deep.py")


def _pair_features(graph, etype: str | None = None) -> DataFrame:
    """(u, v, cn, aa, jac, pa, label) for every 2-hop pair u<v: the classic
    link-prediction features, label 1 when the pair is already an edge.
    One self-join + one groupBy — scales with the adjacency cache."""
    return pair_features_from_und(graph.adjacency(etype, "both"))


def pair_features_from_und(und: DataFrame) -> DataFrame:
    """Feature core over an explicit undirected (src, dst) adjacency
    (both directions present, deduped) — shared by the graph path above
    and the oracle-checked algo_linkpred_feats query."""
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    degz = deg.withColumnRenamed("src", "z").withColumnRenamed("deg", "deg_z")
    a = und.select(F.col("dst").alias("u"), F.col("src").alias("z"))
    b = und.select(F.col("src").alias("z"), F.col("dst").alias("v"))
    two_hop = (a.join(b, "z").filter(F.col("u") < F.col("v")).join(degz, "z"))
    feats = (two_hop.groupBy("u", "v")
             .agg(F.count("*").cast("double").alias("cn"),
                  F.sum(1.0 / F.log(F.col("deg_z") + 1e-9)).alias("aa")))
    feats = (feats
             .join(deg.select(F.col("src").alias("u"),
                              F.col("deg").alias("deg_u")), "u")
             .join(deg.select(F.col("src").alias("v"),
                              F.col("deg").alias("deg_v")), "v")
             .withColumn("jac", F.col("cn") /
                         (F.col("deg_u") + F.col("deg_v") - F.col("cn")))
             .withColumn("pa", (F.col("deg_u") * F.col("deg_v"))
                         .cast("double")))
    existing = und.select(F.least("src", "dst").alias("u"),
                          F.greatest("src", "dst").alias("v"),
                          F.lit(1).alias("label")).dropDuplicates()
    return (feats.join(existing, ["u", "v"], "left")
            .select("u", "v", *_FEATURES,
                    F.coalesce("label", F.lit(0)).alias("label")))


def link_prediction_train(graph, etype: str | None = None,
                          num_epochs: int = 30,
                          learning_rate: float = 0.5) -> dict:
    """link_prediction.train parity: trains the logistic-regression
    baseline (positives = existing edges among 2-hop pairs, negatives =
    the non-adjacent 2-hop pairs) and stores the model on the graph.
    Returns {"weights", "bias", "features", "auc_proxy"}. Each epoch is a
    single distributed aggregation; only 5 floats cross to the driver."""
    feats = _pair_features(graph, etype).persist()
    stats = feats.agg(
        *[F.avg(c).alias(f"m_{c}") for c in _FEATURES],
        *[F.coalesce(F.stddev_pop(c), F.lit(1.0)).alias(f"s_{c}")
          for c in _FEATURES],
        F.count("*").alias("n")).first()
    n = stats["n"]
    if not n:
        feats.unpersist()
        return {"weights": [0.0] * len(_FEATURES), "bias": 0.0,
                "features": _FEATURES, "auc_proxy": 0.5}
    norm = [((F.col(c) - float(stats[f"m_{c}"]))
             / (float(stats[f"s_{c}"]) or 1.0)).alias(c)
            for c in _FEATURES]
    data = feats.select(*norm, "label").persist()
    data.count()
    feats.unpersist()
    w, bias = [0.0] * len(_FEATURES), 0.0
    for _ in range(num_epochs):
        z = F.lit(bias)
        for wi, c in zip(w, _FEATURES):
            z = z + F.lit(wi) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("label")
        g = data.agg(*[F.avg(err * F.col(c)).alias(c) for c in _FEATURES],
                     F.avg(err).alias("__b")).first()
        w = [wi - learning_rate * float(g[c]) for wi, c in zip(w, _FEATURES)]
        bias -= learning_rate * float(g["__b"])
    # separability proxy: mean predicted probability of positives minus
    # negatives (1.0 = perfect, 0.0 = uninformative)
    z = F.lit(bias)
    for wi, c in zip(w, _FEATURES):
        z = z + F.lit(wi) * F.col(c)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    sep = data.agg(
        F.avg(F.when(F.col("label") == 1, p)).alias("pos"),
        F.avg(F.when(F.col("label") == 0, p)).alias("neg")).first()
    data.unpersist()
    model = {"weights": w, "bias": bias, "features": _FEATURES,
             "means": [float(stats[f"m_{c}"]) for c in _FEATURES],
             "stds": [float(stats[f"s_{c}"]) or 1.0 for c in _FEATURES],
             "auc_proxy": (float(sep["pos"]) - float(sep["neg"] or 0.0)
                           if sep["pos"] is not None else 0.5)}
    graph._lp_model = {**model, "etype": etype}
    return model


def link_prediction_predict(graph, top_k: int = 50,
                            etype: str | None = None) -> DataFrame:
    """link_prediction.predict parity: scores non-adjacent 2-hop pairs with
    the trained model — (node1, node2, score). Trains with defaults first
    if no model is stored."""
    model = getattr(graph, "_lp_model", None)
    if model is None or model.get("etype") != etype:
        link_prediction_train(graph, etype)
        model = graph._lp_model
    feats = _pair_features(graph, etype).filter(F.col("label") == 0)
    z = F.lit(model["bias"])
    for wi, c, m, s in zip(model["weights"], _FEATURES,
                           model["means"], model["stds"]):
        z = z + F.lit(wi) * ((F.col(c) - m) / (s or 1.0))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (feats.select(F.col("u").alias("node1"),
                         F.col("v").alias("node2"),
                         score.alias("score"))
            .orderBy(F.desc("score"), "node1", "node2").limit(top_k))


def gnn_link_prediction_train(graph, **config):
    """Deprecated alias: link_prediction.train's default is now the REAL
    deep trainer (algos/linkpred_deep.linkpred_train, reference
    graph_attn/graph_sage encoders); this logistic baseline remains the
    documented layer_type='logistic' fallback."""
    return link_prediction_train(graph, **config)


#
# -- node classification: no-torch baseline ---------------------------------
#
# Reference surface: src/mage/python/node_classification.py — train(num
# epochs) yields per-epoch (epoch, loss, val_loss, train_log, val_log),
# predict(vertex) yields (predicted_class, status); defaults features_name
# ="features", class_name="class", split_ratio=0.8, learning_rate=0.1.
# The GraphSAGE/GAT deep path needs torch and stays gated; the baseline
# here is a softmax regression over GraphSAGE-mean-style features (own
# feature vector ++ one-hop mean of neighbour features), trained by
# distributed batch gradient descent. Two execution shapes:
#   wide: one aggregation job per epoch produces the full k×(D+1)
#         gradient (driver holds only the weight matrix) — used while
#         k*(D+1) stays under NC_WIDE_MAX aggregate expressions;
#   long: features kept as (id, pos, v) rows; the gradient is a
#         join + groupBy((class, pos)) — shuffles per epoch but scales
#         with dimension and class count.

NC_WIDE_MAX = 4096          # max aggregate expressions in the wide path


def _nc_design(graph, features_attr: str, label_attr: str,
               etype: str | None):
    """(id, x array<double>, y long|null) where x = standardized
    [own features ++ mean one-hop neighbour features]. Returns
    (frame, D_own). Neighbour means come from a posexplode + groupBy —
    no driver materialization, no whole-table broadcast."""
    feat = F.col(features_attr).cast("array<double>")
    nodes = (graph.all_nodes([features_attr, label_attr])
             .select("id", feat.alias("f"),
                     F.col(label_attr).cast("long").alias("y"))
             .filter(F.col("f").isNotNull()))
    probe = nodes.select(F.size("f").alias("d")).filter("d > 0").first()
    if probe is None:
        return None, 0
    d = int(probe["d"])
    nodes = nodes.filter(F.size("f") == d)
    own_long = nodes.select("id", F.posexplode("f").alias("pos", "v"))
    und = graph.adjacency(etype, "both").select("src", "dst")
    nb_long = (und.join(own_long.withColumnRenamed("id", "src"), "src")
               .groupBy(F.col("dst").alias("id"), "pos")
               .agg(F.avg("v").alias("v")))
    nb_arr = nb_long.groupBy("id").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s.getField("v")).alias("nf"))
    zeros = F.array_repeat(F.lit(0.0), d)
    x = (nodes.join(nb_arr, "id", "left")
         .select("id", "y",
                 F.concat("f", F.coalesce("nf", zeros)).alias("x")))
    # standardize per dimension (stats computed in long form: 2D rows
    # cross to the driver, never the data)
    stats = (x.select(F.posexplode("x").alias("pos", "v"))
             .groupBy("pos")
             .agg(F.avg("v").alias("m"),
                  F.coalesce(F.nullif(F.stddev_pop("v"), F.lit(0.0)),
                             F.lit(1.0)).alias("s"))
             .orderBy("pos").collect())
    means = F.array(*[F.lit(float(r["m"])) for r in stats])
    stds = F.array(*[F.lit(float(r["s"])) for r in stats])
    x = x.withColumn(
        "x", F.zip_with(F.zip_with("x", means, lambda a, b: a - b),
                        stds, lambda a, b: a / b))
    return x, d


def _nc_epoch_wide(data, W, B, classes):
    """One epoch, wide shape: a single aggregation returns the k×(D+1)
    gradient plus train/val loss + accuracy."""
    k, D = len(W), len(W[0])
    zs = [F.lit(B[c]) + F.aggregate(
        F.zip_with("x", F.array(*[F.lit(w) for w in W[c]]),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v) for c in range(k)]
    zarr = F.array(*zs)
    m = F.array_max(zarr)
    lse = m + F.log(F.aggregate(
        F.transform(zarr, lambda z: F.exp(z - m)),
        F.lit(0.0), lambda acc, v: acc + v))
    yidx = F.col("__yi")
    logp_y = F.element_at(zarr, yidx + 1) - lse
    hit = (F.array_position(zarr, m) - 1 == yidx).cast("double")
    tr = ~F.col("__val")
    aggs = [F.avg(F.when(tr, -logp_y)).alias("__loss"),
            F.avg(F.when(~tr, -logp_y)).alias("__vloss"),
            F.avg(F.when(tr, hit)).alias("__acc"),
            F.avg(F.when(~tr, hit)).alias("__vacc")]
    for c in range(k):
        err = F.exp(zs[c] - lse) - (yidx == c).cast("double")
        aggs.append(F.avg(F.when(tr, err)).alias(f"__gb{c}"))
        for j in range(D):
            aggs.append(F.avg(F.when(tr, err * F.element_at("x", j + 1)))
                        .alias(f"__g{c}_{j}"))
    r = data.agg(*aggs).first()
    grad_w = [[float(r[f"__g{c}_{j}"] or 0.0) for j in range(D)]
              for c in range(k)]
    grad_b = [float(r[f"__gb{c}"] or 0.0) for c in range(k)]
    return grad_w, grad_b, r


def _nc_epoch_long(data, x_long, W, B, classes, spark):
    """One epoch, long shape: logits via a broadcast weight join, the
    gradient via err ⋈ x_long → groupBy (class, pos). Scales with D and
    k at the cost of per-epoch shuffles.

    ONE driver job per epoch (VERDICT r4 item 5): loss/acc/n_train ride
    an Observation on the soft frame (they previously cost a .first(), a
    .count() and a second .collect()), and the bias gradient shares the
    (class, pos) groupBy via the pos=-1 bias column x_long carries."""
    from pyspark.sql import Observation
    k, D = len(W), len(W[0])
    w_rows = [(c, j, W[c][j]) for c in range(k) for j in range(D)]
    wt = F.broadcast(spark.createDataFrame(
        w_rows, "c int, pos int, w double"))
    bt = F.broadcast(spark.createDataFrame(
        list(enumerate(B)), "c int, b double"))
    logits = (x_long.join(wt, "pos")
              .groupBy("id", "c").agg(F.sum(F.col("v") * F.col("w"))
                                      .alias("z0"))
              .join(bt, "c")
              .select("id", "c", (F.col("z0") + F.col("b")).alias("z")))
    per_id = logits.groupBy("id").agg(
        F.max("z").alias("m"),
        F.max_by("c", "z").alias("pred"))
    lse = (logits.join(per_id, "id")
           .groupBy("id").agg(
               (F.first("m") + F.log(F.sum(F.exp(F.col("z") - F.col("m")))))
               .alias("lse"),
               F.first("pred").alias("pred")))
    soft = (logits.join(lse, "id")
            .join(data.select("id", "__yi", "__val"), "id")
            .select("id", "c", "__yi", "__val", "pred",
                    (F.exp(F.col("z") - F.col("lse"))
                     - (F.col("c") == F.col("__yi")).cast("double"))
                    .alias("err"),
                    F.when(F.col("c") == F.col("__yi"),
                           F.col("z") - F.col("lse")).alias("logp_y")))
    tr = ~F.col("__val")
    hit = (F.col("pred") == F.col("__yi")).cast("double")
    obs = Observation()
    soft = soft.observe(
        obs,
        F.avg(F.when(tr, -F.col("logp_y"))).alias("__loss"),
        F.avg(F.when(~tr, -F.col("logp_y"))).alias("__vloss"),
        F.avg(F.when(tr & (F.col("c") == 0), hit)).alias("__acc"),
        F.avg(F.when(~tr & (F.col("c") == 0), hit)).alias("__vacc"),
        F.sum(F.when(tr & (F.col("c") == 0), 1).otherwise(0))
        .alias("__ntrain"))
    # x_long carries a pos=-1, v=1.0 bias column per id, so the bias
    # gradient is the pos=-1 slice of the same groupBy
    g = (soft.filter(tr).join(x_long, "id")
         .groupBy("c", "pos").agg(F.sum(F.col("err") * F.col("v"))
                                  .alias("g")).collect())
    metrics = obs.get
    n_train = int(metrics["__ntrain"] or 0)
    grad_w = [[0.0] * D for _ in range(k)]
    grad_b = [0.0] * k
    for r in g:
        if r["pos"] < 0:
            grad_b[r["c"]] = float(r["g"]) / max(n_train, 1)
        else:
            grad_w[r["c"]][r["pos"]] = float(r["g"]) / max(n_train, 1)
    return grad_w, grad_b, metrics


def node_classification_train(graph, num_epochs: int = 100,
                              learning_rate: float = 0.1,
                              split_ratio: float = 0.8,
                              features_attr: str = "features",
                              label_attr: str = "class",
                              etype: str | None = None,
                              deep: bool = False,
                              layer_type: str = "GATJK",
                              hidden_sizes=None,
                              aggregator: str = "mean",
                              weight_decay: float = 5e-4,
                              seed: int = 1) -> DataFrame:
    """node_classification.train parity (node_classification.py:435).

    No-torch baseline: softmax regression over own ++ mean-neighbour
    features (see module docstring). Yields one row per epoch —
    (epoch, loss, val_loss, train_log, val_log) — the reference record
    shape; the logs carry [accuracy].

    deep=True selects the reference's deep path by layer_type:
    SAGE (all SAGEConv aggregators, algos/sage.py), single-head GAT
    (algos/gat.py), single-head GATv2 (algos/gatv2.py) and GATJK
    (3-head + JumpingKnowledge, the reference default, algos/gatjk.py)
    all train for real without torch — distributed forward/backward,
    the driver holds only the weight matrices. Only an unrecognized
    layer_type still hits the torch dependency gate."""
    if deep:
        lt = str(layer_type).upper()
        if lt == "SAGE":
            import functools

            from memgraph_spark.algos.sage import sage_train
            # sage_train validates the aggregator itself (mean/max/pool/
            # gcn/lstm all run without torch)
            _train = functools.partial(sage_train,
                                       aggregator=str(aggregator))
        elif lt == "GAT":
            from memgraph_spark.algos.gat import gat_train as _train
        elif lt == "GATV2":
            from memgraph_spark.algos.gatv2 import gatv2_train as _train
        elif lt == "GATJK":
            from memgraph_spark.algos.gatjk import gatjk_train as _train
        else:
            _require_torch(
                f"node_classification.train(layer_type={layer_type})")
        rows, model = _train(
            graph, hidden_sizes=hidden_sizes,
            num_epochs=int(num_epochs),
            learning_rate=float(learning_rate),
            weight_decay=float(weight_decay),
            split_ratio=float(split_ratio),
            features_attr=features_attr, label_attr=label_attr,
            etype=etype, seed=int(seed))
        graph._nc_model = model
        return rows
    spark = graph.spark
    design, d_own = _nc_design(graph, features_attr, label_attr, etype)
    out_schema = ("epoch int, loss double, val_loss double, "
                  "train_log array<double>, val_log array<double>")
    if design is None:
        raise ValueError(
            f"node_classification.train: no node carries a non-empty "
            f"'{features_attr}' array property")
    labeled = design.filter(F.col("y").isNotNull())
    classes = [int(r["y"]) for r in
               labeled.select("y").distinct().orderBy("y").collect()]
    if not classes:
        raise ValueError(
            f"node_classification.train: no node carries the "
            f"'{label_attr}' property")
    k, D = len(classes), 2 * d_own
    cmap = F.create_map(*[x for c, i in
                          ((F.lit(c), F.lit(i))
                           for i, c in enumerate(classes)) for x in (c, i)])
    # deterministic split: stable across epochs and runs
    data = (labeled
            .withColumn("__yi", cmap[F.col("y")].cast("int"))
            .withColumn("__val",
                        (F.pmod(F.xxhash64("id"), 1000)
                         >= int(split_ratio * 1000)))
            .persist())
    data.count()
    wide = k * (D + 1) + 4 <= NC_WIDE_MAX
    x_long = None
    if not wide:
        # pos=-1 is the bias column: the epoch's single (class, pos)
        # gradient groupBy then yields grad_b alongside grad_w
        x_long = (data.select("id", F.posexplode("x").alias("pos", "v"))
                  .unionByName(data.select(
                      "id", F.lit(-1).alias("pos"), F.lit(1.0).alias("v")))
                  .persist())
        x_long.count()
    W = [[0.0] * D for _ in range(k)]
    B = [0.0] * k
    rows = []
    for epoch in range(1, int(num_epochs) + 1):
        if wide:
            gw, gb, m = _nc_epoch_wide(data, W, B, classes)
        else:
            gw, gb, m = _nc_epoch_long(data, x_long, W, B, classes, spark)
        W = [[w - learning_rate * g for w, g in zip(W[c], gw[c])]
             for c in range(k)]
        B = [b - learning_rate * g for b, g in zip(B, gb)]
        rows.append((epoch, float(m["__loss"] or 0.0),
                     float(m["__vloss"] or 0.0),
                     [float(m["__acc"] or 0.0)],
                     [float(m["__vacc"] or 0.0)]))
    data.unpersist()
    if x_long is not None:
        x_long.unpersist()
    graph._nc_model = {"weights": W, "bias": B, "classes": classes,
                       "features_attr": features_attr,
                       "label_attr": label_attr, "etype": etype,
                       "d_own": d_own}
    return spark.createDataFrame(rows, out_schema)


def node_classification_predict(graph, vertex) -> DataFrame:
    """node_classification.predict(vertex) parity
    (node_classification.py:655): scores one node with the trained model
    — (predicted_class, status). Raises when no model is stored, like the
    reference's 'Load a model before predicting.'"""
    model = getattr(graph, "_nc_model", None)
    if model is None:
        raise ValueError("Load or train a model before predicting "
                         "(CALL node_classification.train() first).")
    nid = int(vertex)
    if model.get("kind") in ("sage", "gat", "gatv2", "gatjk"):
        if model["kind"] == "sage":
            from memgraph_spark.algos.sage import sage_forward as _fwd
        elif model["kind"] == "gat":
            from memgraph_spark.algos.gat import gat_forward as _fwd
        elif model["kind"] == "gatv2":
            from memgraph_spark.algos.gatv2 import gatv2_forward as _fwd
        else:
            from memgraph_spark.algos.gatjk import gatjk_forward as _fwd
        row = (_fwd(graph, model)
               .filter(F.col("id") == nid).select("h").first())
        if row is None:
            return graph.spark.createDataFrame(
                [(-1, f"node {nid} has no "
                  f"'{model['features_attr']}' feature vector")],
                "predicted_class long, status string")
        z = list(row["h"])
        best = model["classes"][z.index(max(z))]
        return graph.spark.createDataFrame(
            [(int(best), "Prediction complete.")],
            "predicted_class long, status string")
    design, _ = _nc_design(graph, model["features_attr"],
                           model["label_attr"], model["etype"])
    row = (design.filter(F.col("id") == nid).select("x").first()
           if design is not None else None)
    if row is None:
        return graph.spark.createDataFrame(
            [(-1, f"node {nid} has no '{model['features_attr']}' "
              "feature vector")], "predicted_class long, status string")
    x = list(row["x"])
    best, best_z = model["classes"][0], float("-inf")
    for c, (w, b) in enumerate(zip(model["weights"], model["bias"])):
        z = b + sum(wi * xi for wi, xi in zip(w, x))
        if z > best_z:
            best, best_z = model["classes"][c], z
    return graph.spark.createDataFrame(
        [(best, "Prediction complete.")],
        "predicted_class long, status string")


def node_classification_reset(graph) -> DataFrame:
    """node_classification.reset parity (node_classification.py:700)."""
    if hasattr(graph, "_nc_model"):
        del graph._nc_model
    return graph.spark.createDataFrame(
        [("Reset successful.",)], "status string")


def tgn_update(graph, batch, **config):
    """Deprecated entry: the deep TGN (GRU/RNN memory updaters,
    graph-sum / graph-attention embedding layers) now trains without
    torch in algos/tgn_deep.py, dispatched from the registered tgn.*
    procedures (algos/tgn_baseline.py tgn_set_params). Kept only so old
    imports fail with a pointer instead of an AttributeError."""
    raise NotImplementedError(
        "gnn.tgn_update is superseded: call the tgn.* procedures "
        "(algos/tgn_baseline.py), which run the no-torch deep TGN in "
        "algos/tgn_deep.py for gru/rnn configs")
