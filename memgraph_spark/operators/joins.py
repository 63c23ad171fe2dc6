"""Join operators (SURVEY §2.4).

Cypher joins arise from connected patterns (Expand), disconnected patterns
(Cartesian, operator.cpp:7768 -> HashJoin via JoinRewriter, plan/rewrite/
join.hpp:36), OPTIONAL MATCH (Optional, operator.cpp:7287) and pattern
predicates (EvaluatePatternFilter, operator.hpp:2427). Catalyst picks the
physical join (broadcast / sort-merge / shuffled-hash) — the reference's
IndexedJoin nested-loop strategy has no analogue because broadcast + DPP
covers it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def cartesian(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian (operator.hpp:2797): cross product of disconnected patterns."""
    return left.crossJoin(right)


def hash_join(left: DataFrame, right: DataFrame, condition: Column,
              how: str = "inner") -> DataFrame:
    """HashJoin (operator.hpp:3145): equi-join; Catalyst chooses the physical
    strategy (hint with F.broadcast on the small side)."""
    return left.join(right, condition, how)


def optional(left: DataFrame, right: DataFrame, condition: Column) -> DataFrame:
    """Optional (operator.hpp:2636): OPTIONAL MATCH — left outer join, nulls
    for the optional branch's symbols when no match."""
    return left.join(right, condition, "left_outer")


def pattern_semi(df: DataFrame, pattern: DataFrame, condition: Column) -> DataFrame:
    """EvaluatePatternFilter + Filter for `WHERE exists((n)-[]->(m))`
    (operator.hpp:2427): left-semi join against the expanded pattern."""
    return df.join(pattern, condition, "left_semi")


def pattern_anti(df: DataFrame, pattern: DataFrame, condition: Column) -> DataFrame:
    """`WHERE NOT (n)--(m)`: left-anti join against the expanded pattern."""
    return df.join(pattern, condition, "left_anti")
