"""Aggregate / Distinct / Unwind (SURVEY §2.5).

Reference: Aggregate (operator.cpp:6323) is a single-threaded hash table with
per-slot DISTINCT dedup sets; grouping keys are the non-aggregated RETURN/WITH
expressions (Cypher's implicit grouping). Spark's partial/final hash
aggregation with spill replaces it outright; map-side combine is free.

Cypher aggregation ops (src/query/frontend/ast/query/aggregation.hpp:27):
COUNT MIN MAX SUM AVG COLLECT_LIST COLLECT_MAP (+PROJECT_PATH/PROJECT_LISTS/
DERIVE, which build graph values — see catalog.PropertyGraph projections).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate(df: DataFrame, keys: list[Column | str], aggs: list[Column]) -> DataFrame:
    """Aggregate (operator.hpp:1910). `keys` = implicit grouping expressions;
    empty keys = global aggregation (single row, like RETURN count(*))."""
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


def collect_map(key: Column, value: Column) -> Column:
    """COLLECT_MAP aggregation: map built from per-group key/value pairs."""
    return F.map_from_entries(F.collect_list(F.struct(key, value)))


def salted_collect_list(df: DataFrame, keys: list[str], value: str,
                        alias: str) -> DataFrame:
    """Two-phase collect_list for HOT grouping keys (SCALE.md: a groupBy
    whose single hottest key holds ~a partition's share of all rows).

    Algebraic aggregates (sum/count/avg/min/max) never need this —
    Catalyst's partial HashAggregate shrinks them map-side, so the reduce
    task for a hot key receives at most one partial row per map task.
    collect_list partials do NOT shrink: every value of the hot key lands
    in ONE reduce task's buffer. Phase 1 here groups by (keys,
    spark_partition_id) — a per-input-partition combine, so no reduce
    task buffers more than one partition's slice of the hot key; phase 2
    flattens at most `input partitions` partial lists per key. The salt
    is the input partition id: deterministic for a deterministic input,
    stable under task retry (a recomputed partition has the same id and
    contents).

    The final list for the hot key still materializes in one row — the
    win is bounded per-task aggregation buffers and even shuffle write
    sizes, not a smaller result.
    """
    phase1 = (df.withColumn("__salt", F.spark_partition_id())
              .groupBy(*keys, "__salt")
              .agg(F.collect_list(value).alias("__part")))
    return (phase1.groupBy(*keys)
            .agg(F.flatten(F.collect_list("__part")).alias(alias)))


def rollup_collect(graph, df: DataFrame, keys: list[str], value: str,
                   alias: str) -> DataFrame:
    """collect_list keyed by frame columns, with a salted fallback for
    measured hot keys: when the catalog carries a degree hint (populated
    by ANALYZE GRAPH or measure_degree_hint — stats are opt-in, like the
    reference's label_property_index_stats) and the max degree reaches a
    full shuffle partition's share of edges, route through the two-phase
    path. Without a hint the single-shuffle plan runs — small graphs pay
    nothing. The salted path relaxes element order inside each list
    (already implementation-defined: match order is arbitrary in both
    engines)."""
    hint = getattr(graph, "degree_hint", None) or {}
    stat = hint.get(None)
    if stat:
        max_deg, total = stat
        parts = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
        if total and max_deg >= max(1, total // max(parts, 1)):
            return salted_collect_list(df, keys, value, alias)
    return df.groupBy(*keys).agg(F.collect_list(value).alias(alias))


def distinct(df: DataFrame) -> DataFrame:
    """Distinct (operator.hpp:2719): RETURN DISTINCT row dedup. Cypher is bag
    semantics everywhere else — never dedup implicitly."""
    return df.dropDuplicates()


def unwind(df: DataFrame, list_col: Column, out_name: str, keep_empty: bool = False) -> DataFrame:
    """Unwind: UNWIND list AS x -> explode. Cypher UNWIND of NULL/[] produces
    no rows (explode), unless OPTIONAL-style retention is needed."""
    fn = F.explode_outer if keep_empty else F.explode
    return df.withColumn(out_name, fn(list_col))
