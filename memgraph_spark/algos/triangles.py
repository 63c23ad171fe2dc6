"""Triangle counting.

Parity: the reference exposes triangle-based analytics via MAGE modules;
GraphX ships TriangleCount. Classic distributed formulation: orient edges by
(degree, id) so every wedge is enumerated at its lowest-degree vertex (breaks
supernode skew), then close wedges with a join against the normalized edge
set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Returns a single-row DataFrame (n_triangles BIGINT) for the
    undirected simple graph induced by `edges`."""
    und = (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .dropDuplicates()
        .persist()
    )
    deg = und.select(F.col("a").alias("v")).unionAll(und.select(F.col("b").alias("v"))) \
        .groupBy("v").agg(F.count("*").alias("d"))
    # orient each edge from lower-(degree, id) to higher-(degree, id)
    ranked = (
        und.join(deg.withColumnsRenamed({"v": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"v": "b", "d": "db"}), "b")
        .select(
            F.when((F.col("da") < F.col("db"))
                   | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                   F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")))
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e"))
        .select("e.lo", "e.hi")
        .persist()
    )
    # wedges centered at the low-rank vertex, endpoints normalized a<b
    wedges = (
        ranked.alias("p").join(ranked.alias("q"), F.col("p.lo") == F.col("q.lo"))
        .filter(F.col("p.hi") < F.col("q.hi"))
        .select(F.col("p.hi").alias("a"), F.col("q.hi").alias("b"))
    )
    out = wedges.join(und, ["a", "b"], "inner").agg(F.count("*").alias("n_triangles"))
    n = out.localCheckpoint(eager=True)
    ranked.unpersist(); und.unpersist()
    return n
