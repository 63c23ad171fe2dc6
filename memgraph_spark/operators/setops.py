"""Union (SURVEY §2.7).

Reference: Union cursor (operator.hpp:2751); UNION (distinct) is planner-added
Distinct on top of UNION ALL. Column-name sets must match (CypherUnion,
ast.hpp:2005) — unionByName enforces exactly that. Cypher has no
INTERSECT/EXCEPT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union(left: DataFrame, right: DataFrame, distinct: bool = False) -> DataFrame:
    out = left.unionByName(right)
    return out.dropDuplicates() if distinct else out
