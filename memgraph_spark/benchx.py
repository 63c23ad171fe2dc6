"""Extended bench workloads: supernode/skew stress + sf1 scale step.

VERDICT r3 items 1-2. The reference pins supernode skew as the
graph-engine failure mode (tests/mgbench/workloads/supernode.py builds a
hub with ~1000x median degree); sf0.1 is too small to surface O(V^2)
state or driver bottlenecks. This module gives bench.py two extra
sections:

- `skew`: a deterministic power-law graph (~10x the sf0.1 edge count)
  with an explicit supernode, plus a degree-matched FLAT (uniform) twin.
  The frontier-heavy operators (bfs, var-expand, weighted shortest path,
  katz, projection) run on both; the per-query skew/flat ratio is the
  measured straggler signal — a ratio near 1 means the operator's plan
  has no per-key hotspot (hash partitioning spreads a 30k-degree hub's
  edges across all partitions; only a per-KEY aggregation keyed on the
  hub would serialize).
- `sf1`: the sf0.1 star schema replicated 10x with shifted keys
  (referential integrity preserved; nation/region stay fixed like TPC-H),
  headline suite run once — catches super-linear growth between sf0.1
  and sf1 before a real cluster does.

Datasets are generated once into $SPARK_GRAFT_BENCHDATA
(default /root/repo/.benchdata, gitignored) and reused across runs; all
generation is seeded and partition-pinned, so two machines produce
identical bytes.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATA_ROOT = os.environ.get("SPARK_GRAFT_BENCHDATA", "/root/repo/.benchdata")

# skew graph shape: ~10x the sf0.1 CONTAINS edge count (600k), one
# explicit supernode on top of the power-law hubs
SKEW_N = 500_000
SKEW_E = 5_000_000
SKEW_SUPER = 25_000
SEED = 42
PARTS = 64            # pinned partition count => deterministic rand()


def _log(msg: str) -> None:
    print(f"[benchx] {msg}", file=sys.stderr, flush=True)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_DONE"))


def _mark(path: str) -> None:
    with open(os.path.join(path, "_DONE"), "w") as f:
        f.write("ok\n")


# ---------------------------------------------------------------------------
# skew / flat graph generation
# ---------------------------------------------------------------------------

def _edge_frame(spark: SparkSession, skewed: bool) -> DataFrame:
    """(src, dst, w): power-law src (hubs at small ids) + mildly skewed dst
    when `skewed`, uniform otherwise. rand(seed) over a pinned partition
    count is deterministic."""
    base = spark.range(0, SKEW_E, 1, PARTS)
    if skewed:
        src = F.least(F.lit(SKEW_N - 1),
                      F.floor(F.lit(SKEW_N) * F.pow(F.rand(SEED), 2.0)))
        dst = F.least(F.lit(SKEW_N - 1),
                      F.floor(F.lit(SKEW_N) * F.pow(F.rand(SEED + 1), 1.5)))
    else:
        src = F.floor(F.rand(SEED) * SKEW_N)
        dst = F.floor(F.rand(SEED + 1) * SKEW_N)
    edges = base.select(src.cast("long").alias("src"),
                        dst.cast("long").alias("dst"),
                        (F.rand(SEED + 2) * 1.5 + 0.5).alias("w"))
    sup = spark.range(0, SKEW_SUPER, 1, 8).select(
        F.lit(0).cast("long").alias("src")
        if skewed else F.floor(F.rand(SEED + 3) * SKEW_N).cast("long")
        .alias("src"),
        F.floor(F.rand(SEED + 4) * SKEW_N).cast("long").alias("dst"),
        (F.rand(SEED + 5) * 1.5 + 0.5).alias("w"))
    return (edges.unionByName(sup)
            .filter(F.col("src") != F.col("dst"))
            .withColumn("eid", F.xxhash64("src", "dst", F.rand(SEED + 6))))


def ensure_skew_graphs(spark: SparkSession,
                       root: str = DATA_ROOT) -> tuple[str, str]:
    out = []
    for name, skewed in (("skew", True), ("flat", False)):
        path = os.path.join(root, f"graph_{name}")
        if not _done(path):
            _log(f"generating {name} graph ({SKEW_E + SKEW_SUPER} edges) "
                 f"-> {path}")
            _edge_frame(spark, skewed).write.mode("overwrite") \
                .parquet(os.path.join(path, "edges.parquet"))
            _mark(path)
        out.append(path)
    return out[0], out[1]


def _graph(spark: SparkSession, path: str):
    from memgraph_spark.catalog import PropertyGraph
    edges = spark.read.parquet(os.path.join(path, "edges.parquet"))
    nodes = spark.range(SKEW_N).select(F.col("id"))
    return PropertyGraph(spark, nodes={"V": nodes}, edges={"E": edges})


def degree_stats(spark: SparkSession, path: str) -> dict:
    edges = spark.read.parquet(os.path.join(path, "edges.parquet"))
    deg = (edges.select(F.col("src").alias("id"))
           .unionAll(edges.select(F.col("dst").alias("id")))
           .groupBy("id").count())
    r = deg.agg(F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("med"),
                F.count("*").alias("n")).first()
    return {"max_degree": int(r["mx"]), "median_degree": int(r["med"]),
            "touched_nodes": int(r["n"])}


# ---------------------------------------------------------------------------
# skew suite: the frontier-heavy operators from the headline set
# ---------------------------------------------------------------------------

def _skew_queries(g):
    """name -> thunk returning a row count; each mirrors the headline
    operator it stresses (bfs_reach, var_expand, weighted_shortest,
    algo_katz, project_subgraph)."""
    from memgraph_spark.algos.katz import katz_centrality
    from memgraph_spark.operators.expand import (
        bfs, expand_variable, weighted_shortest_path)
    spark = g.spark

    def q_bfs():
        src = spark.createDataFrame([(0,)], "id long")
        return bfs(g, src, None, direction="out", max_hops=3).count()

    def q_var_expand():
        # supernode + 63 spread starts, 1..2 hops
        starts = spark.range(64).select(
            F.when(F.col("id") == 0, F.lit(0))
            .otherwise(F.col("id") * 7919).cast("long").alias("s_id"))
        paths = expand_variable(starts, g, "E", "s", "x",
                                lower=1, upper=2, direction="out",
                                depth_col="depth")
        return paths.groupBy("s_id", "depth").count().count()

    def q_weighted():
        src = spark.createDataFrame([(0,)], "id long")
        return weighted_shortest_path(g, src, "E", "w",
                                      max_iterations=12).count()

    def q_katz():
        return katz_centrality(g.edge("E"), max_iter=8).count()

    def q_project():
        keep = g.node("V").filter(F.col("id") % 2 == 0) \
            .select("id")
        sub = g.project(keep)
        return sub.all_edges().count()

    return {"bfs_reach": q_bfs, "var_expand": q_var_expand,
            "weighted_shortest": q_weighted, "algo_katz": q_katz,
            "project_subgraph": q_project}


def _time_suite(g) -> tuple[dict, dict]:
    """(times, rows): rows is the per-query result cardinality — the skew
    and flat twins do DIFFERENT amounts of work (a supernode BFS reaches
    most of the graph in 2 hops; the flat twin's frontier grows slowly),
    so raw time ratios must be read next to the work ratios."""
    g.edge("E").count()          # warm file metadata
    times, rows = {}, {}
    for name, thunk in _skew_queries(g).items():
        t0 = time.perf_counter()
        rows[name] = int(thunk())
        times[name] = round(time.perf_counter() - t0, 3)
        _log(f"  {name}: {times[name]}s ({rows[name]} rows)")
    return times, rows


def run_skew_bench(spark: SparkSession, root: str = DATA_ROOT) -> dict:
    skew_path, flat_path = ensure_skew_graphs(spark, root)
    _log("skew suite (supernode graph)")
    skew_t, skew_r = _time_suite(_graph(spark, skew_path))
    _log("skew suite (flat twin)")
    flat_t, flat_r = _time_suite(_graph(spark, flat_path))
    ratio = {k: (round(skew_t[k] / flat_t[k], 2) if flat_t[k] > 0 else None)
             for k in skew_t}
    return {"queries": skew_t, "flat": flat_t, "ratio": ratio,
            "rows": skew_r, "flat_rows": flat_r,
            "n_edges": SKEW_E + SKEW_SUPER,
            "skew_degrees": degree_stats(spark, skew_path)}


# ---------------------------------------------------------------------------
# sf1: 10x replicated star schema with shifted keys
# ---------------------------------------------------------------------------

_KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_COPIES = 10
_OFFSET = 10_000_000


def ensure_sf1(spark: SparkSession, sf01_dir: str,
               root: str = DATA_ROOT) -> str:
    path = os.path.join(root, "sf1")
    if _done(path):
        return path
    os.makedirs(path, exist_ok=True)
    _log(f"synthesizing sf1 ({_COPIES}x {sf01_dir}) -> {path}")
    for table in ("region", "nation"):
        spark.read.parquet(f"{sf01_dir}/{table}.parquet") \
            .write.mode("overwrite").parquet(f"{path}/{table}.parquet")
    copies = spark.range(_COPIES).select(
        (F.col("id") * _OFFSET).alias("__off"))
    for table, keys in _KEY_SHIFTS.items():
        df = spark.read.parquet(f"{sf01_dir}/{table}.parquet")
        rep = df.crossJoin(copies)
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__off"))
        rep.drop("__off").write.mode("overwrite") \
            .parquet(f"{path}/{table}.parquet")
    _mark(path)
    return path


def run_sf1_bench(spark: SparkSession, sf01_dir: str,
                  root: str = DATA_ROOT) -> dict:
    from bench import HEADLINE
    from memgraph_spark import queries as Q
    path = ensure_sf1(spark, sf01_dir, root)
    for t in Q.graph_for(spark, path).tables.values():
        t.count()
    times = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        if name not in Q.QUERIES:
            continue
        t0 = time.perf_counter()
        Q.QUERIES[name](spark, path).count()
        times[name] = round(time.perf_counter() - t0, 3)
        _log(f"  sf1 {name}: {times[name]}s")
    return {"queries": times, "passes": 1,
            "total": round(time.perf_counter() - t_all, 3),
            "copies": _COPIES}


# ---------------------------------------------------------------------------
# Pokec-shaped social workload (VERDICT r4 item 9)
# ---------------------------------------------------------------------------
# The reference's published bench envelope is Pokec/LDBC
# (tests/mgbench/workloads/pokec.py:613-1079). These mirror its read/
# aggregate/expansion Cypher shapes over the benchx power-law graph —
# compiled through the Cypher frontend, so the bench exercises
# reference-shaped plans, not only the star schema. The anchor vertex is
# the supernode (id 0): the hardest instance of each shape.

POKEC_QUERIES = {
    # benchmark__aggregation__count
    "aggregation_count":
        "MATCH (n) RETURN count(n) AS cnt, count(n.age) AS cnt_age",
    # benchmark__aggregation__min_max_avg
    "aggregation_min_max_avg":
        "MATCH (n) RETURN min(n.age) AS mn, max(n.age) AS mx, "
        "round(avg(n.age), 4) AS av",
    # benchmark__basic__expansion_1_analytical
    "expansion_1":
        "MATCH (s:User {uid: 0})-->(n:User) RETURN n.uid AS nid",
    # benchmark__basic__expansion_1_with_filter_analytical
    "expansion_1_with_filter":
        "MATCH (s:User {uid: 0})-->(n:User) WHERE n.age >= 40 "
        "RETURN n.uid AS nid",
    # benchmark__basic__expansion_2_analytical
    "expansion_2":
        "MATCH (s:User {uid: 0})-->()-->(n:User) "
        "RETURN DISTINCT n.uid AS nid",
    # benchmark__basic__neighbours_2_analytical
    "neighbours_2":
        "MATCH (s:User {uid: 0})-[*1..2]->(n:User) "
        "RETURN DISTINCT n.uid AS nid",
    # benchmark__match__pattern_cycle
    "pattern_cycle":
        "MATCH (n:User {uid: 0})-[e1]->(m)-[e2]->(n) "
        "RETURN count(*) AS cycles",
    # benchmark__match__pattern_short
    "pattern_short":
        "MATCH (s:User {uid: 0})-->(n) RETURN id(n) AS nid LIMIT 1",
}

# DuckDB oracles over edges.parquet + range(SKEW_N) users with the same
# deterministic age = 18 + id % 43. pattern_short is LIMIT 1 of an
# arbitrary row, so its oracle runs in "subset" mode: exactly one row,
# and that row must be a member of the oracle's full neighbour set.
POKEC_ORACLE_MODE = {"pattern_short": "subset"}

POKEC_ORACLES = {
    "pattern_short":
        "SELECT e.dst AS nid FROM edges e WHERE e.src = 0",
    "aggregation_count":
        "SELECT count(*) AS cnt, count(age) AS cnt_age FROM users",
    "aggregation_min_max_avg":
        "SELECT min(age) AS mn, max(age) AS mx, "
        "round(avg(age), 4) AS av FROM users",
    "expansion_1":
        "SELECT e.dst AS nid FROM edges e WHERE e.src = 0",
    "expansion_1_with_filter":
        "SELECT e.dst AS nid FROM edges e JOIN users u ON u.id = e.dst "
        "WHERE e.src = 0 AND u.age >= 40",
    "expansion_2":
        "SELECT DISTINCT e2.dst AS nid FROM edges e1 "
        "JOIN edges e2 ON e1.dst = e2.src WHERE e1.src = 0",
    "neighbours_2":
        "SELECT DISTINCT nid FROM ("
        "SELECT dst AS nid FROM edges WHERE src = 0 "
        "UNION ALL "
        "SELECT e2.dst AS nid FROM edges e1 "
        "JOIN edges e2 ON e1.dst = e2.src WHERE e1.src = 0)",
    "pattern_cycle":
        "SELECT count(*) AS cycles FROM edges e1 "
        "JOIN edges e2 ON e1.dst = e2.src "
        "WHERE e1.src = 0 AND e2.dst = 0",
}


def _pokec_graph(spark: SparkSession, path: str):
    from memgraph_spark.catalog import PropertyGraph
    edges = spark.read.parquet(os.path.join(path, "edges.parquet"))
    users = spark.range(SKEW_N).select(
        F.col("id"), F.col("id").alias("uid"),
        (F.lit(18) + F.col("id") % 43).alias("age"))
    return PropertyGraph(spark, nodes={"User": users}, edges={"E": edges})


def run_pokec_bench(spark: SparkSession, root: str = DATA_ROOT) -> dict:
    """Times the Pokec-shaped Cypher suite on the supernode graph (warm
    single pass per query after one warm-up) and DuckDB-spot-checks the
    aggregating shapes (sorted-rows equality at full result size)."""
    from memgraph_spark.plans import GraphSession
    skew_path, _flat = ensure_skew_graphs(spark, root)
    gs = GraphSession(_pokec_graph(spark, skew_path))
    gs.graph.edge("E").count()    # warm file metadata
    times, rows, checks = {}, {}, {}
    for name, q in POKEC_QUERIES.items():
        df = gs.execute(q)
        df.count()                # warm-up (plan + codegen)
        t0 = time.perf_counter()
        rows[name] = int(gs.execute(q).count())
        times[name] = round(time.perf_counter() - t0, 3)
        _log(f"  pokec {name}: {times[name]}s ({rows[name]} rows)")
    try:
        import duckdb
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW edges AS SELECT * FROM read_parquet("
            f"'{os.path.join(skew_path, 'edges.parquet')}/*.parquet')")
        con.execute(
            "CREATE VIEW users AS SELECT range AS id, "
            f"18 + range % 43 AS age FROM range(0, {SKEW_N})")
        for name, osql in POKEC_ORACLES.items():
            a = sorted(map(tuple, gs.execute(
                POKEC_QUERIES[name]).collect()))
            b = sorted(map(tuple, con.execute(osql).fetchall()))
            if POKEC_ORACLE_MODE.get(name) == "subset":
                checks[name] = bool(len(a) == 1 and set(a) <= set(b))
            else:
                checks[name] = bool(a == b)
            if not checks[name]:
                _log(f"  pokec ORACLE MISMATCH {name}: "
                     f"{a[:2]} vs {b[:2]}")
    except Exception as exc:  # noqa: BLE001 - bench must not die
        checks["error"] = f"{type(exc).__name__}: {exc}"
    return {"times": times, "rows": rows, "oracle": checks}


# ---------------------------------------------------------------------------
# dst-hot-key aggregation stress (VERDICT r4 item 8)
# ---------------------------------------------------------------------------

DSTHOT_N = 5_000_000
DSTHOT_KEYS = 100_000


def _dsthot_frames(spark: SparkSession):
    """HOT: key 0 holds a full shuffle-partition share (N/parts rows) —
    SCALE.md's named untested shape (the supernode as AGGREGATION key,
    not frontier member). FLAT twin: same N rows uniform over the same
    key count. Generated in-memory, seeded by xxhash64 of the row id —
    deterministic."""
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    hot_share = DSTHOT_N // max(parts, 1)
    base = spark.range(DSTHOT_N).select(
        F.col("id").alias("payload"),
        (F.pmod(F.xxhash64("id"), DSTHOT_KEYS) + 1).alias("uni"))
    hot = base.select(
        F.when(F.col("payload") < hot_share, F.lit(0))
        .otherwise(F.col("uni")).alias("dst"), "payload").persist()
    flat = base.select(F.col("uni").alias("dst"), "payload").persist()
    hot.count(); flat.count()
    return hot, flat, hot_share


def run_dsthot_bench(spark: SparkSession) -> dict:
    """Measures the two-phase salted collect vs the plain single-shuffle
    plan on a hot-key frame, against a flat equal-work twin:

    - collect_hot_plain:  groupBy(dst).collect_list — one reduce task
      buffers the hot key's whole slice
    - collect_hot_salted: operators.aggregate.salted_collect_list
    - collect_flat_plain: the flat twin, plain plan (the ≤1.3x target)
    - sum_hot_plain: algebraic control — Catalyst's partial aggregation
      already neutralizes the hot key for sums, measured to prove it

    Also asserts result equivalence (per-key count + payload sum) between
    the plain and salted collects."""
    import statistics

    from memgraph_spark.operators.aggregate import salted_collect_list
    hot, flat, hot_share = _dsthot_frames(spark)

    def plain(df):
        return (df.groupBy("dst")
                .agg(F.collect_list("payload").alias("vals")).count())

    def salted(df):
        return salted_collect_list(df, ["dst"], "payload", "vals").count()

    def algebraic(df):
        return (df.groupBy("dst")
                .agg(F.sum("payload").alias("s"),
                     F.count("*").alias("n")).count())

    cases = (("collect_hot_plain", lambda: plain(hot)),
             ("collect_hot_salted", lambda: salted(hot)),
             ("collect_flat_plain", lambda: plain(flat)),
             ("collect_flat_salted", lambda: salted(flat)),
             ("sum_hot_plain", lambda: algebraic(hot)),
             ("sum_flat_plain", lambda: algebraic(flat)))
    for _name, thunk in cases:           # warm-up (JIT/codegen)
        thunk()
    times, rows = {}, {}
    raw = {name: [] for name, _ in cases}
    for _ in range(3):                   # per-case medians, hot passes
        for name, thunk in cases:
            t0 = time.perf_counter()
            rows[name] = thunk()
            raw[name].append(round(time.perf_counter() - t0, 3))
    for name, vals in raw.items():
        times[name] = round(statistics.median(vals), 3)
        _log(f"  dsthot {name}: {times[name]}s ({rows[name]} groups)")

    # equivalence: salted and plain agree on per-key size + payload sum
    def digest(agg_df):
        return (agg_df
                .select("dst", F.size("vals").alias("n"),
                        F.aggregate("vals", F.lit(0).cast("long"),
                                    lambda a, x: a + x).alias("s"))
                .agg(F.sum("n"), F.sum("s"), F.count("*")).first())
    d_plain = digest(hot.groupBy("dst")
                     .agg(F.collect_list("payload").alias("vals")))
    d_salt = digest(salted_collect_list(hot, ["dst"], "payload", "vals"))
    equivalent = tuple(d_plain) == tuple(d_salt)
    hot.unpersist(); flat.unpersist()
    flat_t = times["collect_flat_plain"] or 1e-9
    return {"times": times, "groups": rows,
            "hot_share_rows": hot_share,
            "salted_vs_flat_ratio": round(
                times["collect_hot_salted"] / flat_t, 3),
            "plain_vs_flat_ratio": round(
                times["collect_hot_plain"] / flat_t, 3),
            "equivalent": bool(equivalent)}


# ---------------------------------------------------------------------------
# Deep-TGN batch throughput probe (VERDICT r6 item 6: measured, not asserted)
# ---------------------------------------------------------------------------

def run_tgn_bench(spark: SparkSession) -> dict:
    """Streams a small two-community temporal graph through the deep TGN
    (graph_attn/gru/self_supervised, the reference e2e default shape) and
    reports batches/second. Per-batch work is bounded by batch params
    (~L+3 driver jobs — tgn_baseline._process_batch_deep docstring), so
    this measures the driver-side orchestration cost the job-count test
    pins structurally."""
    import memgraph_spark.algos.tgn_baseline as TB
    from memgraph_spark.catalog import PropertyGraph
    n_nodes, bs, n_batches = 64, 32, 6
    nodes = spark.range(n_nodes).select(F.col("id"))
    g = PropertyGraph(spark, nodes={"V": nodes},
                      edges={"E": spark.createDataFrame(
                          [(0, 1)], "src long, dst long")})
    TB.tgn_set_params(g, {
        "batch_size": bs, "num_of_layers": 1, "layer_type": "graph_attn",
        "memory_dimension": 16, "time_dimension": 4,
        "num_node_features": 4, "num_edge_features": 4,
        "num_neighbors": 8, "edge_message_function_type": "identity",
        "message_aggregator_type": "last", "memory_updater_type": "gru",
        "learning_type": "self_supervised"})
    edges, t = [], 0.0
    for i in range(bs * n_batches):
        a = i % (n_nodes // 2)
        b = (a + 1 + (i % 7)) % (n_nodes // 2)
        if i % 2:
            a, b = a + n_nodes // 2, b + n_nodes // 2
        edges.append((a, b, t)); t += 1.0
    TB.tgn_update(g, edges[:bs])          # warm-up batch (plans, codegen)
    t0 = time.perf_counter()
    TB.tgn_update(g, edges[bs:])
    wall = time.perf_counter() - t0
    st = g._tgn_state
    done = st["batch"] - 1                # minus the warm-up batch
    out = {"batches": done, "batch_size": bs, "total_sec": round(wall, 3),
           "batches_per_sec": round(done / wall, 3) if wall > 0 else None}
    _log(f"  tgn {done} deep batches in {out['total_sec']}s "
         f"({out['batches_per_sec']}/s)")
    TB.tgn_reset(g)
    return out
