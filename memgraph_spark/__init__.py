"""memgraph_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of memgraph/memgraph (openCypher property-graph
engine), re-expressed Spark-first.

The reference (/root/reference) is an in-memory C++ property-graph database;
this package is NOT a port: the graph is columnar DataFrames (nodes/edges
tables per label/type), queries compile to DataFrame programs that Catalyst
optimizes, traversals are iterative frontier joins, and streaming is
Structured Streaming + foreachBatch.

Layout (mirrors SURVEY.md §7.0):
  catalog     — PropertyGraph (per-label node DFs + per-type edge DFs), loaders
  operators   — the physical algebra of SURVEY.md §2 as DataFrame combinators
  functions   — Cypher expression/function library -> pyspark Column
  plans       — Cypher frontend: lexer/parser/AST -> DataFrame compiler
  llm         — training-data pipeline ops: dedup, similarity, text analysis
  streaming   — Structured Streaming ingestion, triggers, TTL
"""

__version__ = "0.1.0"

from memgraph_spark.catalog import PropertyGraph, load_tpch_graph  # noqa: F401
from memgraph_spark.session import get_spark  # noqa: F401
