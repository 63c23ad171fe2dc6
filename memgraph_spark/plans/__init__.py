"""Cypher frontend: query string -> AST -> DataFrame program.

Mirrors the reference lifecycle (SURVEY §3.1: ANTLR parse -> CypherMainVisitor
AST -> SymbolGenerator -> RuleBasedPlanner -> operator tree) but collapses the
last two stages: our 'physical plan' IS the DataFrame program, and Catalyst
does the rewrite pipeline (SURVEY §4.1). The parser is a hand-written
recursive-descent over the openCypher grammar subset the reference's test
corpus exercises (grammar: src/query/frontend/opencypher/grammar/Cypher.g4).
"""

from memgraph_spark.plans.session import GraphSession  # noqa: F401
