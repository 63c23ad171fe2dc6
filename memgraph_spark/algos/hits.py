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


def hits(edges: DataFrame, max_iter: int = 30, tol: float = 1e-6) -> DataFrame:
    """HITS over (src, dst) edges; returns (id, hub, authority)."""
    e = edges.select("src", "dst").dropDuplicates().persist()
    nodes = (e.select(F.col("src").alias("id"))
             .unionAll(e.select(F.col("dst").alias("id")))
             .dropDuplicates().persist())
    h = nodes.withColumn("h", F.lit(1.0)).localCheckpoint(eager=True)
    a = None
    prev = None
    for _ in range(max_iter):
        # authority(v) = sum of hub(u) over u -> v
        a = (e.join(h.withColumnRenamed("id", "src"), "src")
             .groupBy(F.col("dst").alias("id"))
             .agg(F.sum("h").alias("a")))
        norm = a.agg(F.sqrt(F.sum(F.col("a") * F.col("a")))).first()[0] or 1.0
        a = a.withColumn("a", F.col("a") / F.lit(norm)) \
             .localCheckpoint(eager=True)
        # hub(u) = sum of authority(v) over u -> v
        h = (e.join(a.withColumnRenamed("id", "dst"), "dst")
             .groupBy(F.col("src").alias("id"))
             .agg(F.sum("a").alias("h")))
        norm = h.agg(F.sqrt(F.sum(F.col("h") * F.col("h")))).first()[0] or 1.0
        h = h.withColumn("h", F.col("h") / F.lit(norm)) \
             .localCheckpoint(eager=True)
        cur = h.agg(F.sum("h")).first()[0]
        if prev is not None and abs(cur - prev) < tol:
            break
        prev = cur
    out = (nodes.join(h, "id", "left").join(a, "id", "left")
           .select("id",
                   F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"),
                   F.coalesce(F.col("a"), F.lit(0.0)).alias("authority")))
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
