"""Scan operators (SURVEY §2.1).

Reference: ScanAll/ScanAllByLabel/ScanAllById/... (operator.hpp:569-997) pull
vertices from skip-list indexes. Here a 'label index' IS the per-label table;
a 'label+property index' is Parquet column stats + pushdown — Catalyst turns
`bind(g, L, "n").filter(...)` into a pruned, filtered parquet scan
(ScanAllByLabelProperties parity without a custom index structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def prefix_columns(df: DataFrame, sym: str) -> DataFrame:
    """Rename every column c -> {sym}_c: binds a table to a Cypher symbol."""
    return df.select([F.col(c).alias(f"{sym}_{c}") for c in df.columns])


def bind(graph, label: str, sym: str, properties: list[str] | None = None) -> DataFrame:
    """ScanAllByLabel (operator.hpp:607): scan one label table, bind to sym.

    `properties=None` keeps all property columns; pass a list to prune early
    (Catalyst prunes anyway once downstream selects are known, but explicit
    pruning keeps intermediate schemas small for unions).
    """
    df = graph.node(label)
    if properties is not None:
        df = df.select("id", *properties)
    return prefix_columns(df, sym)


def scan_by_id(graph, label: str, sym: str, node_id_val: int) -> DataFrame:
    """ScanAllById (operator.hpp:923): point lookup -> pushed-down id filter."""
    return bind(graph, label, sym).filter(F.col(f"{sym}_id") == node_id_val)


def once(spark: SparkSession) -> DataFrame:
    """Once (operator.hpp:342): the one-empty-row plan seed."""
    return spark.range(1).select(F.lit(1).alias("__once"))
