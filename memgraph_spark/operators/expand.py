"""Expand operators — the graph-native family (SURVEY §2.3).

Reference: Expand (operator.cpp:1904) walks per-vertex adjacency vectors;
ExpandVariable (:2199) DFS-enumerates; BFS (:2726), Dijkstra (:3000),
all-shortest (:3309), KShortest/Yen (:3716) are pointer-chasing cursors.

Spark re-expression: one hop = one equi-join against the edge table (Catalyst
picks broadcast/SMJ/SHJ; AQE handles skewed supernodes); variable-length and
shortest paths are *iterative frontier joins* — each round fully distributed,
the driver loop only bounds rounds (graph diameter), never touches rows.
localCheckpoint() truncates lineage so round N's plan doesn't embed rounds
1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Frontiers smaller than this are broadcast in iterative joins so the big
# edge table never shuffles; larger frontiers fall back to shuffle joins
# (the 100 TB path — AQE handles skew there).
BROADCAST_FRONTIER_ROWS = 500_000


def _maybe_broadcast(df: DataFrame, nrows: int) -> DataFrame:
    return F.broadcast(df) if nrows <= BROADCAST_FRONTIER_ROWS else df


def _edges_for(graph, etype, direction: str) -> DataFrame:
    """Edge table oriented so we always traverse src -> dst (not deduped —
    bag semantics for single-hop expand; iterative ops use graph.adjacency)."""
    edges = graph.edge(etype) if etype else graph.all_edges()
    out = edges.select(F.col("src"), F.col("dst"))
    inn = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if direction == "out":
        return out
    if direction == "in":
        return inn
    return out.unionAll(inn)  # BOTH


def expand(
    df: DataFrame,
    graph,
    etype: str,
    from_sym: str,
    to_sym: str,
    direction: str = "out",
    edge_sym: str | None = None,
    edge_properties: list[str] | None = None,
) -> DataFrame:
    """Expand (operator.hpp:1063): one-hop neighbor expansion.

    Adds `{to_sym}_id` (and `{edge_sym}_<prop>` columns if requested) to every
    input row by joining the typed edge table on the bound endpoint.
    """
    edges = graph.edge(etype)
    props = edge_properties or ([] if edge_sym is None else
                                [c for c in edges.columns if c not in ("src", "dst")])
    if direction == "out":
        sel = [F.col("src").alias("__from"), F.col("dst").alias("__to")]
    elif direction == "in":
        sel = [F.col("dst").alias("__from"), F.col("src").alias("__to")]
    else:  # BOTH = union of the two orientations
        return expand(df, graph, etype, from_sym, to_sym, "out", edge_sym, edge_properties) \
            .unionByName(
                expand(df, graph, etype, from_sym, to_sym, "in", edge_sym, edge_properties))
    sel += [F.col(p).alias(f"{edge_sym}_{p}") for p in props] if edge_sym else []
    e = edges.select(*sel)
    joined = df.join(e, df[f"{from_sym}_id"] == e["__from"], "inner")
    return joined.withColumnRenamed("__to", f"{to_sym}_id").drop("__from")


def expand_node_props(
    df: DataFrame,
    graph,
    etype: str,
    from_sym: str,
    to_sym: str,
    label: str,
    properties: list[str],
    direction: str = "out",
) -> DataFrame:
    """Expand + bind target-node properties as ONE operator.

    When the catalog holds a co-located scan for (etype, end) — the edge is
    minted from the target node's own fact table, so one source row IS the
    edge and the node — the node properties ride the edge scan and the
    edge.dst = node.id self-join disappears (at scale: one scan and zero
    extra shuffle/broadcast of the fact table instead of two scans plus a
    join). Falls back to expand + id equi-join when no co-scan applies.
    Output columns: input cols + {to_sym}_id + {to_sym}_<prop>.
    """
    end = {"out": "dst", "in": "src"}.get(direction)
    co = getattr(graph, "co_scan", {}).get((etype, end)) if end else None
    if co is not None and co[0] == label and graph.extra_labels is None:
        _lbl, codf = co
        sel = [F.col("dst" if direction == "out" else "src").alias("__to"),
               F.col("src" if direction == "out" else "dst").alias("__from")]
        sel += [F.col(f"__n_{p}").alias(f"{to_sym}_{p}") for p in properties]
        e = codf.select(*sel)
        return (df.join(e, df[f"{from_sym}_id"] == e["__from"], "inner")
                .withColumnRenamed("__to", f"{to_sym}_id").drop("__from"))
    out = expand(df, graph, etype, from_sym, to_sym, direction)
    node = graph.node(label).select(
        F.col("id").alias("__nid"),
        *[F.col(p).alias(f"{to_sym}_{p}") for p in properties])
    return out.join(node, out[f"{to_sym}_id"] == node["__nid"],
                    "inner").drop("__nid")


def expand_into(
    df: DataFrame,
    graph,
    etype: str,
    from_sym: str,
    to_sym: str,
    direction: str = "out",
) -> DataFrame:
    """Expand in 'expand-into' mode (both endpoints already bound): keep rows
    where the edge exists — a semi-join on (src, dst)."""
    e = _edges_for(graph, etype, direction).select(
        F.col("src").alias("__from"), F.col("dst").alias("__to")
    ).dropDuplicates()
    return (
        df.join(
            e,
            (df[f"{from_sym}_id"] == e["__from"]) & (df[f"{to_sym}_id"] == e["__to"]),
            "left_semi",
        )
    )


def _edges_with_eid(graph, etype, direction: str) -> DataFrame:
    """Oriented edge table carrying the real edge id and a forward flag —
    uniqueness tracking on eid (parallel edges are distinct) plus path
    reconstruction (fwd tells which way the stored edge was traversed)."""
    if etype:
        tables = [(etype, graph.edge(etype))]
    else:
        tables = list(graph.edges.items())
    dfs = []
    for _t, e in tables:
        if "eid" not in e.columns:
            # graphs registered without explicit edge identity: derive one
            e = e.withColumn("eid", F.xxhash64(F.lit(_t or ""), "src", "dst"))
        out = e.select(F.col("src").alias("__from"), F.col("dst").alias("__to"),
                       F.col("eid").alias("__eid"), F.lit(True).alias("__fwd"))
        inn = e.select(F.col("dst").alias("__from"), F.col("src").alias("__to"),
                       F.col("eid").alias("__eid"), F.lit(False).alias("__fwd"))
        if direction == "out":
            dfs.append(out)
        elif direction == "in":
            dfs.append(inn)
        else:
            dfs.append(out.unionAll(inn))
    if not dfs:
        return graph.spark.createDataFrame(
            [], "__from BIGINT, __to BIGINT, __eid BIGINT, __fwd BOOLEAN")
    res = dfs[0]
    for d in dfs[1:]:
        res = res.unionAll(d)
    return res


def expand_variable(
    df: DataFrame,
    graph,
    etype: str | None,
    from_sym: str,
    to_sym: str,
    lower: int = 1,
    upper: int = 8,
    direction: str = "out",
    depth_col: str | None = None,
    hops: dict | None = None,
    path_prefix: str | None = None,
) -> DataFrame:
    """ExpandVariable (operator.cpp:2199): `-[:T*lo..hi]->`.

    Iterative join loop: round k joins the depth-(k-1) rows against the edge
    table, accumulating the visited-edge set per path (Cypher edge-isomorphism:
    an edge may not repeat within a path; nodes may — EdgeUniquenessFilter,
    operator.hpp:1768). Returns the input columns + `{to_sym}_id` (+ depth).

    With path_prefix, also returns `{path_prefix}_nids` (tail node ids, i.e.
    excluding the start), `{path_prefix}_eids`, `{path_prefix}_dirs` — the
    per-row path segment for named-path reconstruction.
    """
    if upper is None:
        # unbounded: the eager loop below breaks as soon as a round adds no
        # rows (edge-uniqueness bounds path length by |E|); the constant is
        # a runaway backstop, not a semantic cap
        upper = 10_000
    # persisted once per (etype, direction) in the catalog — every round
    # re-joins this table and must not re-derive it from the scans
    e = graph.eid_edges(etype, direction)
    base_cols = df.columns
    cur = df.select(
        "*",
        F.col(f"{from_sym}_id").alias("__node"),
        F.lit(0).alias("__depth"),
        F.array().cast("array<long>").alias("__tail"),
        F.array().cast("array<long>").alias("__edges"),
        F.array().cast("array<boolean>").alias("__dirs"),
    )
    results = []
    if lower == 0:
        results.append(cur)
    # Single-hop expansions compile to ONE lazy plan (a broadcast-able join,
    # no per-round materialization). Everything deeper takes the eager loop:
    # depth k>=2 in a lazy plan joins hop k-1's output against the edge frame
    # with NO size information, so Catalyst sort-merge-joins it — a full
    # shuffle of the edge table per extra depth even when the frontier is a
    # few hundred rows (AQE materializes both shuffle stages before it can
    # rewrite the join). The eager loop's checkpoint makes the frontier count
    # known and `_maybe_broadcast` keeps the edges unshuffled below the
    # 500k-row fence — the BFS frontier-join shape, measured 0.70x at sf0.1
    # and structurally safer at scale. Lineage truncation and the hops
    # budget ride the same per-round checkpoint.
    lazy = upper <= 1 and hops is None
    cur_rows = None
    for depth in range(1, upper + 1):
        lhs = cur if cur_rows is None else _maybe_broadcast(cur, cur_rows)
        stepped = (
            lhs.join(e, lhs["__node"] == e["__from"], "inner")
            .filter(~F.array_contains(F.col("__edges"), F.col("__eid")))
            .select(
                *base_cols,
                F.col("__to").alias("__node"),
                (F.col("__depth") + 1).alias("__depth"),
                F.array_append("__tail", F.col("__to")).alias("__tail"),
                F.array_append("__edges", F.col("__eid")).alias("__edges"),
                F.array_append("__dirs", F.col("__fwd")).alias("__dirs"),
            )
        )
        if lazy:
            cur = stepped
            if depth >= lower:
                results.append(cur)
            continue
        from memgraph_spark.session import checkpoint_with_metrics
        stepped, _m = checkpoint_with_metrics(stepped, n=F.count(F.lit(1)))
        cur_rows = _m["n"]
        if cur_rows == 0:
            cur = stepped
            break
        cur = stepped
        if depth >= lower:
            results.append(cur)
        # USING HOPS LIMIT (hops_limit.hpp): each expanded path-edge row
        # consumes quota; on exhaustion stop with partial results (the
        # reference's hops_limit_partial_results=true default)
        if hops is not None and hops.get("limit"):
            hops["used"] += cur_rows
            if hops["used"] >= hops["limit"]:
                hops["reached"] = True
                break
    path_cols = ([f"{path_prefix}_nids", f"{path_prefix}_eids",
                  f"{path_prefix}_dirs"] if path_prefix else [])
    if not results:
        extra = {f"{to_sym}_id": F.lit(None).cast("long")}
        if depth_col:
            extra[depth_col] = F.lit(None).cast("int")
        if path_prefix:
            extra[f"{path_prefix}_nids"] = F.lit(None).cast("array<long>")
            extra[f"{path_prefix}_eids"] = F.lit(None).cast("array<long>")
            extra[f"{path_prefix}_dirs"] = F.lit(None).cast("array<boolean>")
        return df.limit(0).withColumns(extra)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    # rebound the additive rounds×P partition count (see traversal.py
    # _traversal_results) — same rows, far fewer tasks downstream
    p = int(out.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if len(results) > 1 and out.rdd.getNumPartitions() > p:
        out = out.coalesce(p)
    keep = base_cols + [f"{to_sym}_id"] + ([depth_col] if depth_col else []) \
        + path_cols
    out = out.withColumnRenamed("__node", f"{to_sym}_id")
    if depth_col:
        out = out.withColumnRenamed("__depth", depth_col)
    if path_prefix:
        out = (out.withColumnRenamed("__tail", f"{path_prefix}_nids")
               .withColumnRenamed("__edges", f"{path_prefix}_eids")
               .withColumnRenamed("__dirs", f"{path_prefix}_dirs"))
    return out.select(*keep)


def bfs(
    graph,
    sources: DataFrame,
    etype: str | None = None,
    direction: str = "out",
    max_hops: int = 20,
    source_col: str = "id",
    edges_df: DataFrame | None = None,
) -> DataFrame:
    """SingleSourceShortestPath / BFS (operator.cpp:2726).

    `sources` is a DataFrame with a node-id column; returns
    (start BIGINT, id BIGINT, dist INT) — minimal hop distance from each
    start to every reachable node. Each round: frontier ⋈ edges, anti-join
    the visited set, union. Driver loop = diameter iterations only.

    `edges_df` overrides the adjacency frame — a traversal-oriented
    (src, dst) list for callers whose edge-set semantics don't reduce to
    one (etype, direction) pair (e.g. neighbors.at_hop's per-type
    direction prefixes).
    """
    # shared persisted adjacency; every BFS round re-joins it
    edges = edges_df if edges_df is not None else graph.adjacency(etype, direction)
    frontier = sources.select(
        F.col(source_col).alias("start"),
        F.col(source_col).alias("id"),
        F.lit(0).alias("dist"),
    ).localCheckpoint(eager=True)
    # visited = union of per-round frontiers, each already materialized by
    # its own localCheckpoint — no O(rounds^2) re-checkpointing of the union
    visited = frontier
    f_rows = frontier.count()
    v_rows = f_rows
    from memgraph_spark.session import checkpoint_with_metrics
    for d in range(1, max_hops + 1):
        f = _maybe_broadcast(frontier, f_rows)
        # the frontier row count rides the checkpoint job (observe)
        nxt, m = checkpoint_with_metrics(
            f.join(edges, f["id"] == edges["src"], "inner")
            .select(F.col("start"), F.col("dst").alias("id"))
            .dropDuplicates()
            .join(_maybe_broadcast(visited, v_rows), ["start", "id"], "left_anti")
            .withColumn("dist", F.lit(d)),
            n=F.count(F.lit(1)),
        )
        f_rows = m["n"]
        if f_rows == 0:
            break
        v_rows += f_rows
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def shortest_path(
    graph,
    source_id: int,
    target_id: int,
    etype: str | None = None,
    direction: str = "out",
    max_hops: int = 20,
):
    """STShortestPath (operator.cpp:2458): hop distance between two bound
    nodes (None if unreachable). Early-exits the BFS loop on arrival."""
    spark = graph.spark
    sources = spark.createDataFrame([(source_id,)], "id long")
    reach = bfs(graph, sources, etype, direction, max_hops)
    row = reach.filter(F.col("id") == target_id).select(F.min("dist")).first()
    return row[0] if row else None


def weighted_shortest_path(
    graph,
    sources: DataFrame,
    etype: str | None,
    weight_col: str,
    direction: str = "out",
    max_iterations: int = 30,
    source_col: str = "id",
    edges_df: DataFrame | None = None,
) -> DataFrame:
    """ExpandWeightedShortestPath (operator.cpp:3000, Dijkstra with a pq).

    Distributed re-expression: Bellman-Ford-style iterative relaxation with a
    per-(start,node) min-aggregation until fixpoint — the scalable equivalent
    of Dijkstra when the frontier is a DataFrame. Returns (start, id, cost).
    Pass `edges_df` (src, dst, <weight_col>) to mix edge types with
    heterogeneous weights (the reference's weight lambda).
    """
    edges = edges_df if edges_df is not None else graph.edge(etype)
    if direction == "in":
        edges = edges.withColumnRenamed("src", "__t").withColumnRenamed("dst", "src") \
                     .withColumnRenamed("__t", "dst")
    elif direction == "both":
        edges = edges.unionByName(
            edges.withColumnRenamed("src", "__t").withColumnRenamed("dst", "src")
                 .withColumnRenamed("__t", "dst"))
    from memgraph_spark.session import persist_if_needed
    e, release_e = persist_if_needed(
        edges.select(F.col("src"), F.col("dst"),
                     F.col(weight_col).cast("double").alias("__w")))
    init = sources.select(
        F.col(source_col).alias("start"),
        F.col(source_col).alias("id"),
        F.lit(0.0).alias("cost"),
    ).localCheckpoint(eager=True)
    # dist = lazy min-agg over the checkpointed per-round improvement deltas;
    # each delta only holds strict improvements, so no per-round
    # re-materialization of the full distance table is needed. Every
    # CONSOLIDATE_EVERY rounds the delta union is collapsed into ONE
    # checkpoint (and the spent delta blocks freed) — otherwise round k
    # re-aggregates k generations of deltas and the lineage deepens
    # unboundedly on long relaxation chains (skew/sf1 profile).
    from memgraph_spark.session import checkpoint_with_metrics, free_checkpoint
    CONSOLIDATE_EVERY = 4
    pieces = init
    deltas = [init]
    frontier = init
    f_rows = frontier.count()
    for _ in range(max_iterations):
        f = _maybe_broadcast(frontier, f_rows)
        dist = pieces.groupBy("start", "id").agg(F.min("cost").alias("cost"))
        cand = (
            f.join(e, f["id"] == e["src"], "inner")
            .select(F.col("start"), F.col("dst").alias("id"),
                    (F.col("cost") + F.col("__w")).alias("cost"))
            .groupBy("start", "id").agg(F.min("cost").alias("cost"))
        )
        # keep candidates strictly better than the current distance; the
        # row count rides the checkpoint job (observe)
        improved, m = checkpoint_with_metrics(
            cand.join(dist.withColumnRenamed("cost", "__old"), ["start", "id"], "left")
            .filter(F.col("__old").isNull() | (F.col("cost") < F.col("__old")))
            .select("start", "id", "cost"),
            n=F.count(F.lit(1)),
        )
        f_rows = m["n"]
        if f_rows == 0:
            break
        pieces = pieces.unionByName(improved)
        deltas.append(improved)
        frontier = improved
        if len(deltas) >= CONSOLIDATE_EVERY:
            pieces = (pieces.groupBy("start", "id")
                      .agg(F.min("cost").alias("cost"))
                      .localCheckpoint(eager=True))
            # the frontier delta stays live for the next round's join;
            # every other generation is folded into the consolidation
            for d in deltas:
                if d is not frontier:
                    free_checkpoint(d)
            deltas = [frontier]
    release_e()
    out = pieces.groupBy("start", "id").agg(F.min("cost").alias("cost"))
    return out
