"""OrderBy / Skip / Limit (SURVEY §2.6).

Reference: OrderBy (operator.cpp:7026) does a full in-memory ranges::sort with
Cypher's total type order; Skip/Limit are cursor counters. Spark sorts are
distributed + spilling; OrderBy+Limit fuses into TakeOrderedAndProject (top-k)
automatically — the enterprise OrderByParallel merge (operator.cpp:11225) is
the default execution here.

Cypher null ordering: nulls sort FIRST ascending (smallest) — matches Spark's
asc_nulls_first; we make it explicit so the semantics survive config changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def order_by(df: DataFrame, *specs: tuple[Column | str, str]) -> DataFrame:
    cols = []
    for col, dirn in specs:
        col = F.col(col) if isinstance(col, str) else col
        cols.append(col.asc_nulls_first() if dirn.lower().startswith("asc")
                    else col.desc_nulls_last())
    return df.orderBy(*cols)


def skip(df: DataFrame, n: int) -> DataFrame:
    """Skip (operator.hpp:2382): SKIP n."""
    return df.offset(n)


def limit(df: DataFrame, n: int) -> DataFrame:
    """Limit (operator.hpp:2480): LIMIT n; with a preceding sort Spark plans
    top-k (TakeOrderedAndProject), never a full global sort."""
    return df.limit(n)
