"""GNN / TGN link prediction: torch-gated deep path + a real CPU baseline.

Parity targets: the reference's deep-learning modules —
link_prediction GNN (src/mage/python/link_prediction.py),
node_classification (src/mage/python/node_classification.py),
temporal graph networks (src/mage/python/tgn.py), embeddings
(src/mage/python/embeddings.py + embed_worker).

The GNN/TGN paths require torch/dgl, which are not available in this
environment — those entries raise NotImplementedError naming the missing
dependency, the same behaviour the reference exhibits when its
`import torch` fails at module load. link_prediction.train/predict,
however, now run a REAL model without torch: a logistic regression over
the classic neighbourhood features (common neighbours, Adamic-Adar,
Jaccard, preferential attachment). Feature extraction and scoring are
pure DataFrame aggregations; training is distributed batch gradient
descent — each iteration is ONE aggregation job producing the 5-float
gradient, so the driver holds only the weight vector, never the pairs.
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
            "`import torch`); link_prediction.train/predict run the "
            "logistic-regression baseline without it")


def _pair_features(graph, etype: str | None = None) -> DataFrame:
    """(u, v, cn, aa, jac, pa, label) for every 2-hop pair u<v: the classic
    link-prediction features, label 1 when the pair is already an edge.
    One self-join + one groupBy — scales with the adjacency cache."""
    und = graph.adjacency(etype, "both")
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
    """link_prediction.train: the logistic-regression baseline is the
    supported trainer (real scores, no torch); the deep GNN path stays
    gated on torch/dgl like the reference's factory import."""
    return link_prediction_train(graph, **config)


def node_classification_train(graph, **config):
    """node_classification.train parity (GraphSAGE/GAT)."""
    _require_torch("node_classification.train")


def tgn_update(graph, batch, **config):
    """tgn.update parity (temporal graph network)."""
    _require_torch("tgn.update")
