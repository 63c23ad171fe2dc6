"""Graph-backed text search procedures (text_search.* over named indexes).

Reference: tantivy-backed text indexes (src/storage/v2/indices/text_index.cpp,
query_modules 'text_search' surface: search / search_all / regex_search /
aggregate and the *_edges variants; query syntax is tantivy's
`data.<prop>:<term>` atoms with AND/OR/parens).

Spark re-expression: the "index" is DDL metadata (graph.index_registry);
matching is a pure column predicate over the label's node table, so Catalyst
pushes it into the scan. A real tantivy inverted index becomes, at scale, a
tokenized posting-list table bucketed by term (see search/text_index.py for
the BM25 path over the documents corpus).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def resolve_index(g, name: str, edges: bool = False):
    tag = "text-edge" if edges else "text"
    for e in getattr(g, "index_registry", []):
        if len(e) == 4 and e[2] == tag and e[3] == name:
            props = list(e[1]) if e[1] else None
            return e[0], props
    raise ValueError(f"text index {name!r} does not exist")


def _string_view(df: DataFrame, col: str):
    """A string rendering of a property column (variant -> vs slot)."""
    t = df.schema[col].dataType
    if isinstance(t, T.StructType) and "vs" in t.names:
        return F.col(col).getField("vs")
    if isinstance(t, (T.ArrayType, T.MapType, T.StructType)):
        return F.lit(None).cast("string")
    return F.col(col).cast("string")


def _prop_cols(df: DataFrame, allowed: list[str] | None,
               meta: tuple[str, ...]) -> list[str]:
    from memgraph_spark.plans import cypher_ast as A
    cols = [c for c in df.columns if c not in meta]
    if allowed is not None:
        want = {A.prop_col(p) for p in allowed}
        cols = [c for c in cols if c in want]
    return cols


def _word_match(sv, term: str):
    pat = f"(?i)(^|\\W){re.escape(term)}(\\W|$)"
    return F.coalesce(sv.rlike(pat), F.lit(False))


# -- tantivy-ish query parser ------------------------------------------------

_TOK = re.compile(r"\(|\)|\s+|AND\b|OR\b|[^\s()]+")


def parse_query(q: str):
    """'(data.a:x OR data.b:y) AND data.c:z' -> nested tuples."""
    tokens = [t for t in _TOK.findall(q) if t.strip()]
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def eat():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    def atom():
        t = eat()
        if t == "(":
            e = or_expr()
            assert peek() == ")", q
            eat()
            return e
        m = re.fullmatch(r"data\.(\w+):(.*)", t)
        if m:
            return ("term", m.group(1), m.group(2))
        return ("term", None, t)

    def and_expr():
        e = atom()
        while peek() == "AND":
            eat()
            e = ("and", e, atom())
        return e

    def or_expr():
        e = and_expr()
        while peek() == "OR":
            eat()
            e = ("or", e, and_expr())
        return e

    e = or_expr()
    return e


def query_predicate(df: DataFrame, ast, allowed: list[str] | None,
                    meta: tuple[str, ...]):
    from memgraph_spark.plans import cypher_ast as A
    kind = ast[0]
    if kind == "and":
        return query_predicate(df, ast[1], allowed, meta) \
            & query_predicate(df, ast[2], allowed, meta)
    if kind == "or":
        return query_predicate(df, ast[1], allowed, meta) \
            | query_predicate(df, ast[2], allowed, meta)
    _, prop, term = ast
    if prop is not None:
        if allowed is not None and prop not in allowed:
            return F.lit(False)
        col = A.prop_col(prop)
        if col not in df.columns:
            return F.lit(False)
        return _word_match(_string_view(df, col), term)
    cols = _prop_cols(df, allowed, meta)
    out = F.lit(False)
    for c in cols:
        out = out | _word_match(_string_view(df, c), term)
    return out


# -- result shaping ----------------------------------------------------------

NODE_META = ("id", "labels", "key")
EDGE_META = ("src", "dst", "eid", "type")


def _node_df(g, label: str) -> DataFrame:
    df = g.nodes.get(label)
    if df is None:
        return None
    lbl = (F.array(F.lit(label)) if label
           else F.array().cast("array<string>"))
    return g.with_extra_labels(df.withColumn("labels", lbl))


def node_struct(df: DataFrame, alias: str = "node"):
    props = [c for c in df.columns if c not in NODE_META]
    return df.select(F.struct(
        F.col("id"), F.col("labels"),
        *[F.col(c) for c in sorted(props)]).alias(alias))


def _edge_df(g, etype: str) -> DataFrame:
    return g.edges.get(etype)


def edge_struct(df: DataFrame, etype: str, alias: str = "edge"):
    props = [c for c in df.columns if c not in EDGE_META]
    return df.select(F.struct(
        F.col("eid"), F.lit(etype).alias("type"), F.col("src"),
        F.col("dst"), *[F.col(c) for c in sorted(props)]).alias(alias))


# -- procedures --------------------------------------------------------------

def search(g, index_name: str, q: str, edges: bool = False) -> DataFrame:
    label, props = resolve_index(g, index_name, edges=edges)
    if edges:
        df = _edge_df(g, label)
        if df is None:
            return g.spark.createDataFrame([], "edge string").select(
                F.lit(None).alias("edge"))
        pred = query_predicate(df, parse_query(q), props, EDGE_META)
        return edge_struct(df.filter(pred), label)
    df = _node_df(g, label)
    if df is None:
        return g.spark.createDataFrame([], "node string").select(
            F.lit(None).alias("node")).limit(0)
    pred = query_predicate(df, parse_query(q), props,
                           NODE_META)
    return node_struct(df.filter(pred))


def search_all(g, index_name: str, term: str,
               edges: bool = False) -> DataFrame:
    label, props = resolve_index(g, index_name, edges=edges)
    ast = ("term", None, term)
    if edges:
        df = _edge_df(g, label)
        pred = query_predicate(df, ast, props, EDGE_META)
        return edge_struct(df.filter(pred), label)
    df = _node_df(g, label)
    pred = query_predicate(df, ast, props, NODE_META)
    return node_struct(df.filter(pred))


def regex_search(g, index_name: str, pattern: str,
                 edges: bool = False) -> DataFrame:
    label, props = resolve_index(g, index_name, edges=edges)
    pat = f"(?i){pattern}"
    if edges:
        df = _edge_df(g, label)
        meta = EDGE_META
    else:
        df = _node_df(g, label)
        meta = NODE_META
    pred = F.lit(False)
    for c in _prop_cols(df, props, meta):
        pred = pred | F.coalesce(_string_view(df, c).rlike(pat),
                                 F.lit(False))
    out = df.filter(pred)
    return edge_struct(out, label) if edges else node_struct(out)


def aggregate(g, index_name: str, q: str, aggs_json: str,
              edges: bool = False) -> DataFrame:
    """tantivy-style aggregations over the matched set: value_count, sum,
    avg, min, max on a `data.<prop>` field."""
    from memgraph_spark.plans import cypher_ast as A
    label, props = resolve_index(g, index_name, edges=edges)
    if edges:
        df = _edge_df(g, label)
        meta = EDGE_META
    else:
        df = _node_df(g, label)
        meta = NODE_META
    matched = df.filter(query_predicate(df, parse_query(q), props, meta))
    spec = json.loads(aggs_json)
    aggs = []
    for out_name, body in spec.items():
        (op, params), = body.items()
        field = params["field"]
        field = field[5:] if field.startswith("data.") else field
        col = A.prop_col(field)
        c = (F.col(col) if col in matched.columns
             else F.lit(None))
        fn = {"value_count": F.count, "sum": F.sum, "avg": F.avg,
              "min": F.min, "max": F.max}[op]
        aggs.append(fn(c).cast("double").alias(out_name))
    row = matched.agg(*aggs).collect()[0]
    result = {k: {"value": row[k]} for k in spec}
    return g.spark.createDataFrame(
        [(json.dumps(result, separators=(",", ":")),)],
        "aggregation string")
