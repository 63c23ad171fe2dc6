"""HITS (hubs & authorities) power iteration + RMAT graph generator.

Reference: src/mage/cpp/cugraph_module/algorithms/hits.cu and
graph_generator.cu (the GPU module's algorithms, re-expressed as
distributed DataFrame iteration — the CPU/cluster path).

HITS: a ← L2-normalized Aᵀh, h ← L2-normalized Aa per round; each round is
two shuffles on the edge key, lineage truncated with localCheckpoint. RMAT:
every edge picks its quadrant per recursion level independently, so the
whole generation is one `spark.range(E)` with per-level column expressions
— embarrassingly parallel, no driver loop over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memgraph_spark.session import (checkpoint_with_metrics, free_checkpoint,
                                    persist_if_needed)


def hits(edges: DataFrame, max_iter: int = 30, tol: float = 1e-6) -> DataFrame:
    """HITS over (src, dst) edges; returns (id, hub, authority).

    Each half-round is ONE job: the un-normalized scores checkpoint while
    their L2 norm (and convergence sum) ride the job via observe; the
    division by the norm is applied lazily over the cached blocks, so no
    separate norm/convergence probes run."""
    e, release_e = persist_if_needed(edges.select("src", "dst").dropDuplicates())
    nodes, release_n = persist_if_needed(
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .dropDuplicates())
    h = nodes.withColumn("h", F.lit(1.0)).localCheckpoint(eager=True)
    h_ck, a_ck = h, None
    a = None
    prev = None
    for _ in range(max_iter):
        # authority(v) = sum of hub(u) over u -> v
        a_raw, am = checkpoint_with_metrics(
            e.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("a")),
            sq=F.sum(F.col("a") * F.col("a")))
        if a_ck is not None:
            free_checkpoint(a_ck)
        a_ck = a_raw
        a_norm = (am["sq"] or 1.0) ** 0.5 or 1.0
        a = a_raw.withColumn("a", F.col("a") / F.lit(a_norm))
        # hub(u) = sum of authority(v) over u -> v
        h_raw, hm = checkpoint_with_metrics(
            e.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("h")),
            sq=F.sum(F.col("h") * F.col("h")), s=F.sum("h"))
        free_checkpoint(h_ck)
        h_ck = h_raw
        h_norm = (hm["sq"] or 1.0) ** 0.5 or 1.0
        h = h_raw.withColumn("h", F.col("h") / F.lit(h_norm))
        cur = (hm["s"] or 0.0) / h_norm
        if prev is not None and abs(cur - prev) < tol:
            break
        prev = cur
    # materialize the result BEFORE releasing e/nodes — a lazy return would
    # recompute the edge dedup + vertex derivation on every caller action
    out = (nodes.join(h, "id", "left").join(a, "id", "left")
           .select("id",
                   F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"),
                   F.coalesce(F.col("a"), F.lit(0.0)).alias("authority"))
           .localCheckpoint(eager=True))
    if a_ck is not None:
        free_checkpoint(a_ck)
    free_checkpoint(h_ck)
    release_e(); release_n()
    return out


def rmat(spark, scale: int = 10, num_edges: int = 10000,
         a: float = 0.57, b: float = 0.19, c: float = 0.19,
         seed: int = 42) -> DataFrame:
    """RMAT edge generator: 2^scale vertices, num_edges edges, quadrant
    probabilities (a, b, c, 1-a-b-c). Fully distributed: one range() scan,
    `scale` column expressions, no shuffle at all."""
    df = spark.range(int(num_edges)).select(F.col("id").alias("edge_id"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(int(scale)):
        r = F.rand(seed + level)
        src_bit = (r >= a + b).cast("long")          # quadrants c, d
        dst_bit = ((r >= a) & (r < a + b) | (r >= a + b + c)).cast("long")
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    return df.select("edge_id", src.alias("src"), dst.alias("dst"))
