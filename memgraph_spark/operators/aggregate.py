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


def distinct(df: DataFrame) -> DataFrame:
    """Distinct (operator.hpp:2719): RETURN DISTINCT row dedup. Cypher is bag
    semantics everywhere else — never dedup implicitly."""
    return df.dropDuplicates()


def unwind(df: DataFrame, list_col: Column, out_name: str, keep_empty: bool = False) -> DataFrame:
    """Unwind: UNWIND list AS x -> explode. Cypher UNWIND of NULL/[] produces
    no rows (explode), unless OPTIONAL-style retention is needed."""
    fn = F.explode_outer if keep_empty else F.explode
    return df.withColumn(out_name, fn(list_col))
