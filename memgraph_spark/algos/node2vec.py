"""node2vec: distributed second-order biased random walks + SGNS embeddings.

Parity: the reference's node2vec module
(src/mage/cpp/node2vec_module/node2vec_module.cpp — args registered at
:275-297; walks in algorithm/second_order_random_walk.hpp, embeddings via a
word2vec skip-gram trainer).

Spark re-expression: the walk simulation — the part that scales with graph
size — is fully distributed. Every walk advances one step per round via a
join against the persisted adjacency; the p/q second-order bias needs to
know whether candidate `nxt` neighbours `prev`, which is one more join on
(prev, nxt). Weighted sampling per walk uses the exponential-race trick
(min of -log(u)/w is a draw proportional to w), picked with min_by — one
groupBy per step, no Python in the loop.

The SGNS trainer mirrors the reference's single-node gensim step: the walk
corpus (num_walks x walk_length node ids, *not* the graph) is collected and
trained with a small numpy skip-gram-negative-sampling loop. Corpus size is
O(n_nodes * num_walks * walk_length) ids — the knob the caller controls.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node2vec_walks(
    graph,
    p: float = 2.0,
    q: float = 0.5,
    num_walks: int = 4,
    walk_length: int = 5,
    etype: str | None = None,
    is_directed: bool = False,
    seed: int = 1,
) -> DataFrame:
    """Returns (start, rep, step, node) — one row per visited position;
    group by (start, rep) and sort by step to recover each walk."""
    direction = "out" if is_directed else "both"
    adj = graph.adjacency(etype, direction)
    nodes = (adj.select(F.col("src").alias("id"))
             .unionAll(adj.select(F.col("dst").alias("id")))
             .dropDuplicates())
    reps = graph.spark.range(num_walks).select(F.col("id").cast("int").alias("rep"))
    state = (nodes.crossJoin(reps)
             .select(F.col("id").alias("start"), "rep",
                     F.lit(None).cast("long").alias("prev"),
                     F.col("id").alias("cur"))
             .localCheckpoint(eager=True))
    trace = [state.select("start", "rep", F.lit(0).alias("step"),
                          F.col("cur").alias("node"))]
    nbr = adj.select(F.col("src").alias("prev"), F.col("dst").alias("nxt"),
                     F.lit(1).alias("is_nbr"))
    for step in range(1, walk_length):
        cand = (state.join(adj, state["cur"] == adj["src"])
                .select("start", "rep", "prev", "cur", F.col("dst").alias("nxt"))
                .join(nbr, ["prev", "nxt"], "left"))
        w = (F.when(F.col("prev").isNull(), F.lit(1.0))            # first hop
             .when(F.col("nxt") == F.col("prev"), F.lit(1.0 / p))  # return
             .when(F.col("is_nbr") == 1, F.lit(1.0))               # stay close
             .otherwise(F.lit(1.0 / q)))                           # explore
        race = -F.log(F.rand(seed + step) + F.lit(1e-12)) / w
        state = (cand.withColumn("r", race)
                 .groupBy("start", "rep")
                 .agg(F.min_by("nxt", "r").alias("cur"),
                      F.any_value("cur").alias("prev"))
                 .select("start", "rep", "prev", "cur")
                 .localCheckpoint(eager=True))
        if state.isEmpty():
            break
        trace.append(state.select("start", "rep", F.lit(step).alias("step"),
                                  F.col("cur").alias("node")))
    out = trace[0]
    for t in trace[1:]:
        out = out.unionByName(t)
    return out


def _sgns_train(corpus, dims, window, epochs, negative, alpha, min_alpha, seed):
    """Numpy skip-gram negative sampling over the collected walk corpus
    (the reference delegates this exact step to single-node gensim)."""
    vocab = sorted({n for walk in corpus for n in walk})
    idx = {n: i for i, n in enumerate(vocab)}
    V = len(vocab)
    rng = np.random.default_rng(seed)
    W = (rng.random((V, dims)) - 0.5) / dims     # input vectors
    C = np.zeros((V, dims))                      # context vectors
    # unigram^0.75 negative-sampling table
    counts = np.zeros(V)
    for walk in corpus:
        for n in walk:
            counts[idx[n]] += 1
    probs = counts ** 0.75
    probs /= probs.sum()
    steps = max(1, epochs * len(corpus))
    t = 0
    for epoch in range(epochs):
        for walk in corpus:
            lr = max(min_alpha, alpha * (1 - t / steps))
            t += 1
            ids = [idx[n] for n in walk]
            for i, c in enumerate(ids):
                lo, hi = max(0, i - window), min(len(ids), i + window + 1)
                for j in range(lo, hi):
                    if j == i:
                        continue
                    o = ids[j]
                    negs = rng.choice(V, size=negative, p=probs)
                    targets = np.concatenate(([o], negs))
                    labels = np.zeros(len(targets))
                    labels[0] = 1.0
                    vecs = C[targets]                      # (k+1, d)
                    scores = 1.0 / (1.0 + np.exp(-vecs @ W[c]))
                    g = (labels - scores) * lr             # (k+1,)
                    C[targets] += np.outer(g, W[c])
                    W[c] += g @ vecs
    return vocab, W


def node2vec_embeddings(
    graph,
    is_directed: bool = False,
    p: float = 2.0,
    q: float = 0.5,
    num_walks: int = 4,
    walk_length: int = 5,
    vector_size: int = 100,
    alpha: float = 0.025,
    window: int = 5,
    negative: int = 5,
    epochs: int = 5,
    min_alpha: float = 0.0001,
    seed: int = 1,
    etype: str | None = None,
) -> DataFrame:
    """node2vec.get_embeddings parity: returns (node, embedding) rows
    (the reference packs them into two parallel lists — same content)."""
    walks = node2vec_walks(graph, p, q, num_walks, walk_length, etype,
                           is_directed, seed)
    seqs = (walks.groupBy("start", "rep")
            .agg(F.transform(F.sort_array(F.collect_list(F.struct("step", "node"))),
                             lambda s: s["node"]).alias("seq")))
    corpus = [r.seq for r in seqs.collect()]
    if not corpus:
        return graph.spark.createDataFrame([], "node long, embedding array<double>")
    vocab, W = _sgns_train(corpus, vector_size, window, epochs, negative,
                           alpha, min_alpha, seed)
    rows = [(int(n), [float(x) for x in W[i]]) for i, n in enumerate(vocab)]
    return graph.spark.createDataFrame(rows, "node long, embedding array<double>")
