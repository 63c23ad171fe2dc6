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
    # compact-forward closure: per oriented edge (lo, hi), triangles whose
    # rank-lowest vertex is lo are |N+(lo) n N+(hi)| — the wedge list never
    # materializes as rows. The former wedge self-join emitted sum C(d+,2)
    # ROWS through a shuffle + sort-merge join (166M rows at sf0.1, where
    # the co-supply projection is the complete graph K_1000); here the same
    # elements flow as array members inside one codegen stage. Degree
    # orientation bounds every adjacency array by O(sqrt E), so collect_list
    # is supernode-safe at any scale (the standard arboricity argument).
    adj = ranked.groupBy("lo").agg(F.collect_list("hi").alias("nb"))
    pairs = (
        ranked
        .join(adj.select(F.col("lo").alias("jl"), F.col("nb").alias("nb_lo")),
              F.col("lo") == F.col("jl"))
        # inner join: an edge whose hi has no out-neighbours contributes 0
        .join(adj.select(F.col("lo").alias("jh"), F.col("nb").alias("nb_hi")),
              F.col("hi") == F.col("jh"))
    )
    out = pairs.agg(
        F.coalesce(
            F.sum(F.size(F.array_intersect("nb_lo", "nb_hi"))), F.lit(0)
        ).cast("long").alias("n_triangles"))
    n = out.localCheckpoint(eager=True)
    ranked.unpersist(); und.unpersist()
    return n
