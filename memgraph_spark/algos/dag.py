"""DAG utilities: topological sort, cycle detection, spanning tree.

Parity: igraphalg.topological_sort / contains_cycle
(src/mage/python/igraphalg.py:86-230) and igraphalg.spanning_tree (:144).

Spark re-expression: topological sort is iterative zero-in-degree peeling —
each layer is one groupBy(dst) + anti-join, O(#layers) rounds, every round
fully distributed. A cycle exists iff peeling stalls with nodes left.
Spanning tree is Boruvka: each round every component picks its minimum
outgoing edge (min_by over a groupBy on component), components merge via
hash-min label propagation — O(log n) rounds, all joins/aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.session import checkpoint_with_metrics, free_checkpoint


def topological_layers(graph, etype: str | None = None, mode: str = "out"):
    """Returns (id, layer) DataFrame, or None if the graph has a cycle.
    mode="out": edges point dependency -> dependent (igraph semantics);
    mode="in" reverses."""
    adj = graph.adjacency(etype, "out" if mode == "out" else "in")
    # Kahn's algorithm with distributed in-degree decrements: each edge is
    # aggregated exactly ONCE across the whole peel (when its source leaves),
    # so total shuffle volume is O(E) rather than O(E x layers). Per layer,
    # the (small) zero set is checkpointed for the result and the previous
    # in-degree frame's blocks are freed — total cached storage is O(V)
    # regardless of layer count (a chain-like DAG would otherwise pin
    # O(V^2) rows). Row/zero counts ride the checkpoint jobs via observe.
    from memgraph_spark.operators.expand import _maybe_broadcast
    nodes = graph.adjacency_vertices(etype, "out" if mode == "out" else "in")
    indeg0 = (nodes.join(
        adj.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("indeg")),
        "id", "left")
        .select("id", F.coalesce("indeg", F.lit(0)).alias("indeg")))
    _metrics = dict(n=F.count(F.lit(1)),
                    zeros=F.count(F.when(F.col("indeg") == 0, 1)))
    x, m = checkpoint_with_metrics(indeg0, **_metrics)
    layers, zeros, layer, remaining = [], [], 0, m["n"]
    while remaining > 0:
        if m["zeros"] == 0:
            free_checkpoint(x)
            for z in zeros:  # free per-layer zero checkpoints on the
                free_checkpoint(z)  # cycle path: nothing is returned
            return None  # no zero-in-degree node left -> cycle
        zero = (x.filter(F.col("indeg") == 0).select("id")
                .localCheckpoint(eager=True))
        zeros.append(zero)
        layers.append(zero.withColumn("layer", F.lit(layer)))
        remaining -= m["zeros"]
        if remaining == 0:
            free_checkpoint(x)
            break
        dec = (adj.join(_maybe_broadcast(
                   zero.withColumnRenamed("id", "src"), m["zeros"]), "src")
               .groupBy(F.col("dst").alias("id"))
               .agg(F.count("*").alias("c")))
        new_x, m = checkpoint_with_metrics(
            x.filter(F.col("indeg") > 0)
            .join(dec, "id", "left")
            .select("id", (F.col("indeg") - F.coalesce("c", F.lit(0)))
                    .alias("indeg")),
            **_metrics)
        free_checkpoint(x)
        x = new_x
        layer += 1
    if not layers:
        return graph.spark.createDataFrame([], "id long, layer int")
    out = layers[0]
    for df in layers[1:]:
        out = out.unionByName(df)
    # materialize the union into ONE checkpoint so every per-layer zero
    # checkpoint can be freed here instead of leaking until driver GC;
    # caller owns the single returned O(V) frame
    out = out.localCheckpoint(eager=True)
    for z in zeros:
        free_checkpoint(z)
    return out


def contains_cycle(graph, etype: str | None = None) -> bool:
    """igraphalg.contains_cycle parity (igraphalg.py:203-230)."""
    return topological_layers(graph, etype) is None


def spanning_tree(graph, weights: str | None = None,
                  etype: str | None = None) -> DataFrame:
    """Minimum spanning forest via Boruvka; returns (src, dst) tree edges.
    Unweighted (weights=None) treats every edge as weight 1 (igraph default:
    an arbitrary spanning tree)."""
    if weights:
        edges = (graph.edge(etype) if etype
                 else graph.all_edges(properties=[weights]))
        e = edges.select("src", "dst",
                         F.col(weights).cast("double").alias("w"))
    else:
        e = (graph.edge(etype) if etype else graph.all_edges()) \
            .select("src", "dst", F.lit(1.0).alias("w"))
    # undirected: keep both orientations so either endpoint can claim the edge
    und = e.unionByName(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst"), "w")) \
        .groupBy("src", "dst").agg(F.min("w").alias("w")).persist()
    comp = (und.select(F.col("src").alias("id"))
            .dropDuplicates()
            .withColumn("comp", F.col("id"))
            .localCheckpoint(eager=True))
    picked = []
    for _ in range(64):  # ~log2(n) rounds suffice; hard bound for safety
        lbl = und \
            .join(comp.withColumnRenamed("id", "src")
                      .withColumnRenamed("comp", "c_src"), "src") \
            .join(comp.withColumnRenamed("id", "dst")
                      .withColumnRenamed("comp", "c_dst"), "dst") \
            .filter(F.col("c_src") != F.col("c_dst"))
        if lbl.isEmpty():
            break
        # each component claims its minimum outgoing edge; the tie-break key
        # (w, lo, hi) is a total order symmetric in orientation, so
        # equal-weight picks can never close a cycle between components
        choice = (lbl.groupBy("c_src")
                  .agg(F.min(F.struct(F.col("w"),
                                      F.least("src", "dst").alias("lo"),
                                      F.greatest("src", "dst").alias("hi"))).alias("m")))
        picked.append(choice.select(F.col("m.lo").alias("src"),
                                    F.col("m.hi").alias("dst"))
                      .dropDuplicates().localCheckpoint(eager=True))
        # merge: recompute components over the tree edges picked so far
        # (hash-min WCC, the same machinery as algos/components.py)
        from memgraph_spark.algos.components import weakly_connected_components
        tree = picked[0]
        for df in picked[1:]:
            tree = tree.unionByName(df)
        wcc = weakly_connected_components(tree.dropDuplicates())
        new_comp = (comp.select("id")
                    .join(wcc.withColumnRenamed("component", "c"), "id", "left")
                    .select("id", F.coalesce("c", F.col("id")).alias("comp"))
                    .localCheckpoint(eager=True))
        free_checkpoint(comp)
        comp = new_comp
    und.unpersist()
    free_checkpoint(comp)
    if not picked:
        return graph.spark.createDataFrame([], "src long, dst long")
    out = picked[0]
    for df in picked[1:]:
        out = out.unionByName(df)
    out = out.dropDuplicates().localCheckpoint(eager=True)
    for p in picked:
        free_checkpoint(p)
    return out
