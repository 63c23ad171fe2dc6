"""Administrative statements: index DDL, constraints, ANALYZE GRAPH, SHOW.

Parity: the reference's non-Cypher query classes — IndexQuery / DropIndex,
ConstraintQuery (src/query/frontend/ast/ast.hpp:2263+, Constraint::Type
:3145), AnalyzeGraphQuery, StorageInfoQuery, SHOW SCHEMA INFO
(src/storage/v2/schema_info.cpp). These route around the Cypher clause
grammar in the reference too (separate query types in MemgraphCypher.g4),
so GraphSession dispatches them before the Cypher parser.

Spark mapping: an "index" is metadata only — the columnar layout plus
Catalyst parquet pushdown already provides what the reference's skip-list
index provides, so CREATE INDEX records intent (and SHOW INDEX INFO reports
it with live counts); ANALYZE GRAPH materializes the per-label/property
statistics the reference stores in label_property_index_stats.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(q: str) -> str:
    return re.sub(r"\s+", " ", q.strip().rstrip(";").strip())


def try_admin(graph, query: str) -> DataFrame | None:
    """Returns a result DataFrame when `query` is an admin statement,
    else None (the caller then compiles it as Cypher)."""
    q = _norm(query)
    u = q.upper()
    spark = graph.spark
    if not hasattr(graph, "index_registry"):
        graph.index_registry = []          # [(label, prop | None)]
    if not hasattr(graph, "constraint_registry"):
        from memgraph_spark.schema import ConstraintSet
        graph.constraint_registry = ConstraintSet(graph)

    m = re.match(r"CREATE INDEX ON :(\w+)(?: ?\((\w+)\))?$", q, re.I)
    if m:
        entry = (m.group(1), m.group(2))
        if entry not in graph.index_registry:
            graph.index_registry.append(entry)
        return spark.createDataFrame([], "status string")

    m = re.match(r"DROP INDEX ON :(\w+)(?: ?\((\w+)\))?$", q, re.I)
    if m:
        entry = (m.group(1), m.group(2))
        if entry in graph.index_registry:
            graph.index_registry.remove(entry)
        return spark.createDataFrame([], "status string")

    if u == "SHOW INDEX INFO":
        rows = []
        for label, prop in graph.index_registry:
            n = graph.label_count(label) if label in graph.nodes else 0
            rows.append(("label" if prop is None else "label+property",
                         label, prop, n))
        return spark.createDataFrame(
            rows or [], "index_type string, label string, property string, "
                        "count long")

    m = re.match(r"CREATE CONSTRAINT ON \(\w+:(\w+)\) ASSERT "
                 r"(?:EXISTS ?\(\w+\.(\w+)\)|\w+\.(\w+) IS UNIQUE)$", q, re.I)
    if m:
        label = m.group(1)
        if m.group(2):  # existence
            graph.constraint_registry.create_existence(label, m.group(2))
        else:
            graph.constraint_registry.create_unique(label, m.group(3))
        c = graph.constraint_registry.show()[-1]
        n_bad = graph.constraint_registry.violations(c).count()
        if n_bad:  # the reference refuses to create a violated constraint
            graph.constraint_registry._constraints.pop()
            raise ValueError(
                f"constraint violated by {n_bad} existing nodes")
        return spark.createDataFrame([], "status string")

    m = re.match(r"DROP CONSTRAINT ON \(\w+:(\w+)\) ASSERT "
                 r"(?:EXISTS ?\(\w+\.(\w+)\)|\w+\.(\w+) IS UNIQUE)$", q, re.I)
    if m:
        label, prop = m.group(1), m.group(2) or m.group(3)
        kind = "exists" if m.group(2) else "unique"
        graph.constraint_registry._constraints = [
            c for c in graph.constraint_registry.show()
            if not (c.kind == kind and c.label == label
                    and prop in c.properties)]
        return spark.createDataFrame([], "status string")

    if u == "SHOW CONSTRAINT INFO":
        rows = [(c.kind, c.label, list(c.properties))
                for c in graph.constraint_registry.show()]
        return spark.createDataFrame(
            rows or [], "constraint_type string, label string, "
                        "properties array<string>")

    if u == "SHOW STORAGE INFO":
        n_nodes = graph.total_node_count()
        n_edges = sum(graph.edge(t).count() for t in graph.edges)
        rows = [("vertex_count", str(n_nodes)),
                ("edge_count", str(n_edges)),
                ("label_count", str(len(graph.nodes))),
                ("edge_type_count", str(len(graph.edges))),
                ("storage_mode", "IN_MEMORY_ANALYTICAL")]
        return spark.createDataFrame(rows, "storage_info string, value string")

    if u == "SHOW SCHEMA INFO":
        from memgraph_spark.schema import schema_info
        return schema_info(graph)

    m = re.match(r"ANALYZE GRAPH(?: ON LABELS ((?::\w+(?:, ?)?)+))?$", q, re.I)
    if m:
        labels = ([s.strip().lstrip(":") for s in m.group(1).split(",")]
                  if m.group(1) else list(graph.nodes))
        rows = []
        for lbl in labels:
            if lbl not in graph.nodes:
                continue
            df = graph.nodes[lbl]
            n = graph.label_count(lbl)
            for prop in [c for c in df.columns if c != "id"]:
                stats = df.agg(
                    F.count(prop).alias("nn"),
                    F.approx_count_distinct(prop).alias("nd")).first()
                avg_group = (stats.nn / stats.nd) if stats.nd else 0.0
                rows.append((lbl, prop, n, int(stats.nd),
                             round(float(avg_group), 2)))
        return spark.createDataFrame(
            rows or [],
            "label string, property string, num_estimation_nodes long, "
            "num_groups long, avg_group_size double")

    return None
