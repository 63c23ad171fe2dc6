"""Temporal graph network surface — no-torch baseline.

Parity target: src/mage/python/tgn.py (set_params / update / get /
predict_link_score / train_and_eval / get_results / set_eval / reset).
The reference's deep path (GRU memory updater, graph-attention
embedding, MLP link scorer) needs torch and stays gated in algos/gnn.py;
this module implements the same PROTOCOL with the learning-free temporal
baseline family the TGN paper compares against (time-decayed memory +
message aggregation — Jodie/time-decay style):

- **memory**: per-node vector, exponentially decayed by interaction gap
  and EMA-updated with the batch message (the no-torch analog of the
  GRU updater);
- **message**: mean over the batch's neighbours of (decayed neighbour
  memory + a deterministic hash basis of the neighbour id) — identity
  message function + mean aggregator, so co-interacting nodes converge
  to nearby memories;
- **embedding**: memory + mean of neighbour memories (one graph-sum
  layer, attention-free);
- **link score**: sigmoid(dot(emb_src, emb_dst)).

Every batch step is DataFrame joins/aggregations over the memory frame —
the driver holds parameters and the batch loop counter only, so the
memory table scales with |V| across a cluster. Batch-loop semantics
mirror the reference: `update` buffers stream edges and trains a batch
whenever `batch_size` accumulate; `set_eval` splits the stream;
`train_and_eval` replays the buffered stream for N epochs.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULTS = {
    "batch_size": 64,
    "memory_dimension": 16,
    "time_dimension": 1,
    "decay": 0.001,            # memory decay per time unit
    "alpha": 0.5,              # EMA weight of the new message
    "num_neighbors": 10,
    "layer_type": "graph_sum",
    "memory_updater_type": "ema",
    "message_aggregator_type": "mean",
    "edge_message_function_type": "identity",
}


def _state(graph) -> dict:
    if not hasattr(graph, "_tgn_state"):
        graph._tgn_state = {
            "params": dict(DEFAULTS), "buffer": [], "edges_df": None,
            "memory": None, "results": [], "mode": "train",
            "split_idx": None, "edge_count": 0, "epoch": 0, "batch": 0,
        }
    return graph._tgn_state


def _append_stream(graph, rows: list, base: int) -> None:
    """Append batch rows to the DISTRIBUTED stream history (seq, src,
    dst, ts) starting at sequence `base`. The driver never holds more
    than one batch of rows at a time — the history itself lives as a
    checkpointed frame that scales with the cluster, not the driver
    heap."""
    st = _state(graph)
    df = graph.spark.createDataFrame(
        [(base + i, s, d, t) for i, (s, d, t) in enumerate(rows)],
        "seq long, src long, dst long, ts double")
    from memgraph_spark.session import free_checkpoint
    if st["edges_df"] is None:
        st["edges_df"] = df.localCheckpoint(eager=True)
    else:
        merged = st["edges_df"].unionByName(df).localCheckpoint(eager=True)
        free_checkpoint(st["edges_df"])
        st["edges_df"] = merged


def _flush_unprocessed(graph) -> None:
    """Move still-buffered (untrained) rows into the history frame so
    replay and readout see the full ingested stream."""
    st = _state(graph)
    if st["buffer"]:
        rows, st["buffer"] = st["buffer"], []
        _append_stream(graph, rows, st["edge_count"] - len(rows))


def _batch_rows(graph, lo: int, hi: int) -> list:
    """Fetch one replay batch [lo, hi) from the distributed history —
    at most batch_size rows cross to the driver."""
    st = _state(graph)
    if st["edges_df"] is None:
        return []
    return [(r["src"], r["dst"], r["ts"]) for r in
            st["edges_df"].filter((F.col("seq") >= lo)
                                  & (F.col("seq") < hi))
            .orderBy("seq").collect()]


def tgn_set_params(graph, params: dict | None = None) -> DataFrame:
    """tgn.set_params(params) — initializes the module (tgn.py set_params);
    unknown keys are stored verbatim (the reference also accepts the full
    config map). Requesting a torch-only layer/updater raises the same
    dependency gate as the deep path."""
    st = _state(graph)
    p = {**st["params"], **(params or {})}
    if str(p.get("layer_type")) in ("graph_attn",) or \
            str(p.get("memory_updater_type")) in ("gru", "rnn"):
        from memgraph_spark.algos.gnn import _require_torch
        _require_torch(f"tgn layer_type={p.get('layer_type')} / "
                       f"memory_updater_type={p.get('memory_updater_type')}")
    st["params"] = p
    st["memory"] = None
    return graph.spark.createDataFrame(
        [("TGN initialized.",)], "message string")


def _ensure_memory(graph) -> DataFrame:
    st = _state(graph)
    if st["memory"] is None:
        d = int(st["params"]["memory_dimension"])
        ids = graph.all_nodes().select("id")
        st["memory"] = (ids.withColumn(
            "mem", F.array_repeat(F.lit(0.0), d))
            .withColumn("last_ts", F.lit(0.0))
            .localCheckpoint(eager=True))
    return st["memory"]


def _hash_basis(col, d: int):
    """Deterministic unit-ish vector for a node id: one-hot at
    xxhash64(id) % d with sign from the next bit — gives distinct nodes
    distinguishable messages without any learned feature."""
    h = F.abs(F.xxhash64(col))
    pos = (h % d).cast("int")
    sign = F.when((h % (2 * d)) >= d, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.transform(F.sequence(F.lit(0), F.lit(d - 1)),
                       lambda i: F.when(i == pos, sign)
                       .otherwise(F.lit(0.0)))


def _process_batch(graph, batch_rows: list) -> None:
    """One TGN batch step over `batch_rows` = [(src, dst, ts), ...]:
    decay -> message (mean over batch partners) -> EMA memory update.
    One groupBy + two joins; only the batch literal leaves the driver."""
    if not batch_rows:
        return
    st = _state(graph)
    p = st["params"]
    d = int(p["memory_dimension"])
    alpha, decay = float(p["alpha"]), float(p["decay"])
    mem = _ensure_memory(graph)
    spark = graph.spark
    batch = spark.createDataFrame(batch_rows, "src long, dst long, ts double")
    # interactions touch both directions: each endpoint receives a message
    inter = (batch.select(F.col("src").alias("id"),
                          F.col("dst").alias("nbr"), "ts")
             .unionAll(batch.select(F.col("dst").alias("id"),
                                    F.col("src").alias("nbr"), "ts")))
    nbr_mem = mem.select(F.col("id").alias("nbr"),
                         F.col("mem").alias("nbr_mem"))
    contrib = (inter.join(nbr_mem, "nbr", "left")
               .select("id", "ts",
                       F.zip_with(
                           F.coalesce("nbr_mem",
                                      F.array_repeat(F.lit(0.0), d)),
                           _hash_basis(F.col("nbr"), d),
                           lambda a, b: a + b).alias("msg")))
    msgs = (contrib
            .select("id", "ts", F.posexplode("msg").alias("pos", "v"))
            .groupBy("id", "pos")
            .agg(F.avg("v").alias("v"), F.max("ts").alias("ts"))
            .groupBy("id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s.getField("v")).alias("msg"),
                F.max("ts").alias("msg_ts")))
    decay_f = F.exp(-F.lit(decay) *
                    F.greatest(F.col("msg_ts") - F.col("last_ts"),
                               F.lit(0.0)))
    new_mem = (mem.join(msgs, "id", "left")
               .select(
                   "id",
                   F.when(F.col("msg").isNull(), F.col("mem"))
                   .otherwise(F.zip_with(
                       F.transform("mem", lambda m: m * decay_f
                                   * F.lit(1.0 - alpha)),
                       F.transform("msg", lambda m: m * F.lit(alpha)),
                       lambda a, b: a + b)).alias("mem"),
                   F.coalesce("msg_ts", "last_ts").alias("last_ts")))
    from memgraph_spark.session import free_checkpoint
    new_mem = new_mem.localCheckpoint(eager=True)
    free_checkpoint(st["memory"])
    st["memory"] = new_mem


def tgn_update(graph, edges) -> DataFrame:
    """tgn.update(edges) — buffer stream edges; train a batch whenever
    batch_size accumulate (tgn.py update). `edges` rows are (src, dst[,
    ts]) tuples/lists; ts defaults to arrival order."""
    st = _state(graph)
    p = st["params"]
    for e in edges or []:
        row = list(e) if not isinstance(e, (int, float)) else [e]
        src, dst = int(row[0]), int(row[1])
        ts = float(row[2]) if len(row) > 2 else float(st["edge_count"])
        st["buffer"].append((src, dst, ts))
        st["edge_count"] += 1
    while len(st["buffer"]) >= int(p["batch_size"]):
        batch = st["buffer"][:int(p["batch_size"])]
        st["buffer"] = st["buffer"][int(p["batch_size"]):]
        t0 = time.perf_counter()
        _process_batch(graph, batch)
        _append_stream(graph, batch,
                       st["edge_count"] - len(st["buffer"]) - len(batch))
        st["batch"] += 1
        st["results"].append(
            (st["epoch"], st["batch"],
             round(time.perf_counter() - t0, 3), None, st["mode"]))
    # zero-COLUMN frame: the reference update() returns mgp.Record() (one
    # empty record), so in-query CALLs keep the frame's cardinality via
    # session.py's void_like pass-through; a 0-row typed frame would
    # annihilate every frame row through the per-row join
    from pyspark.sql import types as T
    return graph.spark.createDataFrame([], T.StructType([]))


def tgn_get(graph) -> DataFrame:
    """tgn.get() YIELD node, embedding — memory + mean neighbour memory
    (one graph-sum layer) for every node seen so far."""
    st = _state(graph)
    mem = _ensure_memory(graph)
    d = int(st["params"]["memory_dimension"])
    _flush_unprocessed(graph)
    if st["edges_df"] is not None:
        seen = st["edges_df"]
        und = (seen.select("src", "dst")
               .unionAll(seen.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst"))))
        nbr = (und.join(mem.select(F.col("id").alias("dst"),
                                   F.col("mem").alias("nm")), "dst")
               .select(F.col("src").alias("id"),
                       F.posexplode("nm").alias("pos", "v"))
               .groupBy("id", "pos").agg(F.avg("v").alias("v"))
               .groupBy("id").agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("pos", "v"))),
                   lambda s: s.getField("v")).alias("nbr_mean")))
    else:
        nbr = mem.select("id").limit(0).withColumn(
            "nbr_mean", F.array_repeat(F.lit(0.0), d))
    return (mem.join(nbr, "id", "left")
            .select(F.col("id").alias("node"),
                    F.zip_with(
                        "mem",
                        F.coalesce("nbr_mean",
                                   F.array_repeat(F.lit(0.0), d)),
                        lambda a, b: F.round(a + F.lit(0.5) * b, 6))
                    .alias("embedding")))


def tgn_predict_link_score(graph, src, dest) -> DataFrame:
    """tgn.predict_link_score(src, dest) YIELD prediction —
    sigmoid(dot(emb_src, emb_dest)) (tgn.py:835; MLP scorer replaced by
    the dot-product baseline)."""
    emb = tgn_get(graph)
    rows = {r["node"]: r["embedding"] for r in
            emb.filter(F.col("node").isin([int(src), int(dest)]))
            .collect()}
    a = rows.get(int(src))
    b = rows.get(int(dest))
    if a is None or b is None:
        raise ValueError("predict_link_score: unseen vertex "
                         f"{src if a is None else dest}")
    z = sum(x * y for x, y in zip(a, b))
    return graph.spark.createDataFrame(
        [(round(1.0 / (1.0 + math.exp(-max(min(z, 50.0), -50.0))), 6),)],
        "prediction double")


def tgn_set_eval(graph) -> DataFrame:
    """tgn.set_eval() — records the train/eval split point in the edge
    stream (tgn.py set_eval)."""
    st = _state(graph)
    st["split_idx"] = st["edge_count"]
    st["mode"] = "eval"
    return graph.spark.createDataFrame(
        [("TGN mode changed to 'eval'.",)], "message string")


def _eval_precision(graph, batch_rows: list) -> float:
    """Ranking precision on a batch: fraction of true edges (u, v) whose
    score beats the corrupted pair (u, w) with a deterministic
    hash-sampled w."""
    emb = tgn_get(graph)
    spark = graph.spark
    batch = spark.createDataFrame(batch_rows, "src long, dst long, ts double")
    ids = emb.select(F.col("node"))
    n = ids.count()
    if n == 0:
        return 0.0
    neg = (batch.withColumn(
        "rk", (F.abs(F.xxhash64("src", "dst", "ts")) % n))
        .join(ids.withColumn(
            "rk", (F.row_number().over(Window.orderBy("node")) - 1)
            .cast("long")), "rk")
        .select("src", "dst", F.col("node").alias("wneg")))
    e = emb.select(F.col("node"), F.col("embedding"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, v: acc + v)
    scored = (neg
              .join(e.select(F.col("node").alias("src"),
                             F.col("embedding").alias("ea")), "src")
              .join(e.select(F.col("node").alias("dst"),
                             F.col("embedding").alias("eb")), "dst")
              .withColumn("pos_score", dot)
              .drop("eb")
              .join(e.select(F.col("node").alias("wneg"),
                             F.col("embedding").alias("eb")), "wneg")
              .withColumn("neg_score", dot))
    r = scored.agg(F.avg((F.col("pos_score") > F.col("neg_score"))
                         .cast("double")).alias("p")).first()
    return round(float(r["p"] or 0.0), 4)


def tgn_train_and_eval(graph, num_epochs: int = 1) -> DataFrame:
    """tgn.train_and_eval(num_epochs) — replays the buffered edge stream
    (train part re-trains the memory, eval part scores ranking
    precision); yields (epoch_num, batch_num, batch_process_time,
    precision, batch_type) like tgn.py:863. Requires a prior set_eval."""
    st = _state(graph)
    if st["split_idx"] is None:
        raise ValueError("set_eval must be called before train_and_eval "
                         "(no train/eval split recorded)")
    p = st["params"]
    bs = int(p["batch_size"])
    _flush_unprocessed(graph)
    split, total = st["split_idx"], st["edge_count"]
    rows = []
    for epoch in range(1, int(num_epochs) + 1):
        st["epoch"] = epoch
        batch_no = 0
        for lo in range(0, split, bs):
            batch = _batch_rows(graph, lo, min(lo + bs, split))
            t0 = time.perf_counter()
            _process_batch(graph, batch)
            prec = _eval_precision(graph, batch)
            batch_no += 1
            rows.append((epoch, batch_no,
                         round(time.perf_counter() - t0, 3), prec,
                         "train"))
        for lo in range(split, total, bs):
            batch = _batch_rows(graph, lo, min(lo + bs, total))
            if not batch:
                continue
            t0 = time.perf_counter()
            prec = _eval_precision(graph, batch)
            batch_no += 1
            rows.append((epoch, batch_no,
                         round(time.perf_counter() - t0, 3), prec,
                         "eval"))
    st["results"].extend(rows)
    return graph.spark.createDataFrame(
        rows, "epoch_num int, batch_num int, batch_process_time double, "
              "precision double, batch_type string")


def tgn_get_results(graph) -> DataFrame:
    st = _state(graph)
    return graph.spark.createDataFrame(
        [r for r in st["results"] if r[3] is not None] or [],
        "epoch_num int, batch_num int, batch_process_time double, "
        "precision double, batch_type string")


def tgn_reset(graph) -> DataFrame:
    if hasattr(graph, "_tgn_state"):
        from memgraph_spark.session import free_checkpoint
        st = graph._tgn_state
        for key in ("edges_df", "memory"):
            if st.get(key) is not None:
                free_checkpoint(st[key])
        del graph._tgn_state
    return graph.spark.createDataFrame(
        [("Reset was successful.",)], "message string")
