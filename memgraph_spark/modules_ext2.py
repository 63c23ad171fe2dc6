"""Utility-module batch 3: graph_analyzer, temporal, xml_module, llm_util,
llm (reference: query_modules/graph_analyzer.py,
src/mage/python/temporal.py, src/mage/python/xml_module.py,
src/mage/python/llm_util.py, src/mage/python/llm.py).

graph_analyzer mirrors the reference's networkx-backed whole-graph report
(driver-side, size-guarded — same execution shape the reference chose).
llm_util.schema is computed from the catalog's DataFrame schemas directly:
the observed-schema the reference scans the whole graph for
(llm_util.py:35-53) is metadata we already hold, so no scan is needed —
only the label-pair relationship list requires one distributed join.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import functions as F

from memgraph_spark.algos import nxalg_module as _nxm
from memgraph_spark.procedures import register

# ---------------------------------------------------------------------------
# graph_analyzer (query_modules/graph_analyzer.py)
# ---------------------------------------------------------------------------

_MAX_LIST_SIZE = 10  # graph_analyzer.py:23 — long lists are truncated to 10


def _ga_analyses():
    nx = _nxm._nx()

    def und(g):
        return g.to_undirected()

    return [
        ("nodes", "Number of nodes", lambda g: nx.number_of_nodes(g)),
        ("edges", "Number of edges", lambda g: nx.number_of_edges(g)),
        ("bridges", "Bridges",
         lambda g: list(nx.bridges(nx.Graph(und(g))))),
        ("articulation_points", "Articulation points",
         lambda g: list(nx.articulation_points(nx.Graph(und(g))))),
        ("avg_degree", "Average degree",
         lambda g: 0 if nx.number_of_nodes(g) == 0
         else nx.number_of_edges(g) / nx.number_of_nodes(g)),
        ("sorted_nodes_degree", "Sorted nodes degree",
         lambda g: sorted(((n, g.degree(n)) for n in g.nodes()),
                          key=lambda x: x[1], reverse=True)),
        ("self_loops", "Self loops",
         lambda g: sum(1 for u, v in g.edges() if u == v)),
        ("is_bipartite", "Is bipartite",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.is_bipartite(g)),
        ("is_planar", "Is planar",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.check_planarity(g)[0]),
        ("is_biconnected: ", "Is biconnected",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.is_biconnected(nx.Graph(und(g)))),
        ("is_weakly_connected", "Is weakly connected",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.is_weakly_connected(g)),
        ("number_of_weakly_components", "Number of weakly connected components",
         lambda g: nx.number_weakly_connected_components(g)),
        ("is_strongly_connected", "Is strongly connected",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.is_strongly_connected(g)),
        ("strongly_components", "Strongly connected components",
         lambda g: [sorted(c) for c in
                    nx.strongly_connected_components(g)]),
        ("is_dag", "Is DAG",
         lambda g: nx.is_directed_acyclic_graph(g)),
        ("is_eulerian", "Is eulerian",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.is_eulerian(g)),
        ("is_forest", "Is forest",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.is_forest(nx.DiGraph(g))),
        ("is_tree", "Is tree",
         lambda g: False if nx.number_of_nodes(g) == 0
         else nx.is_tree(nx.DiGraph(g))),
    ]


def _ga_run(g, G, analyses):
    by_key = {key: (title, fn) for key, title, fn in _ga_analyses()}
    if analyses is None:
        selected = [(t, f) for _, t, f in _ga_analyses()]
    else:
        selected = []
        for name in analyses:
            if name.lower() not in by_key:
                raise KeyError(
                    "Graph analysis is not supported: " + str(name))
            selected.append(by_key[name.lower()])
    rows = []
    for title, fn in selected:
        value = fn(G)
        if isinstance(value, (list, set, tuple)):
            value = list(value)[:_MAX_LIST_SIZE]
        rows.append((title, str(value)))
    return g.spark.createDataFrame(rows, "name string, value string")


def _ga_analyze(g, analyses=None):
    """graph_analyzer.analyze([analyses]) YIELD name, value."""
    return _ga_run(g, _nxm._graph(g, directed=True, multi=True), analyses)


def _ga_analyze_subgraph(g, vertices, edges, analyses=None):
    """graph_analyzer.analyze_subgraph(vertices, edges, [analyses]) YIELD
    name, value."""
    return _ga_run(g, _nxm._subgraph(g, vertices, edges), analyses)


def _ga_help(g):
    """graph_analyzer.help() YIELD name, value."""
    rows = [("Procedure 'help'", "Shows manual page for graph_analyzer."),
            ("Procedure 'analyze'", "Shows graph information."),
            ("Procedure 'analyze_subgraph'", "Shows subgraph information.")]
    rows += [(f"Analysis '{key}'", title) for key, title, _ in _ga_analyses()]
    return g.spark.createDataFrame(rows, "name string, value string")


# ---------------------------------------------------------------------------
# temporal.format (src/mage/python/temporal.py)
# ---------------------------------------------------------------------------

_UNIX_EPOCH = _dt.datetime(1970, 1, 1)


def _temporal_format(g, temporal, fmt: str = "ISO"):
    """temporal.format(temporal, format) YIELD formatted — ISO or strftime;
    %z/%Z rejected (UTC-only engine, temporal.py:21)."""
    if not isinstance(temporal, (_dt.datetime, _dt.date, _dt.time,
                                 _dt.timedelta)):
        out = str(temporal)
    else:
        if "%z" in fmt or "%Z" in fmt:
            raise ValueError("UTC-only engine: '%Z' format not supported")
        if fmt == "ISO" and isinstance(temporal, (_dt.datetime, _dt.date,
                                                  _dt.time)):
            out = temporal.isoformat()
        else:
            if isinstance(temporal, _dt.timedelta):
                temporal = _UNIX_EPOCH + temporal
            out = temporal.strftime(fmt)
    return g.spark.createDataFrame([(out,)], "formatted string")


# ---------------------------------------------------------------------------
# xml_module (src/mage/python/xml_module.py)
# ---------------------------------------------------------------------------

def _xml_element_to_map(element, simple: bool):
    out = {"_type": element.tag}
    out.update({k: str(v) for k, v in element.attrib.items()})
    if element.text and element.text.strip():
        out["_text"] = element.text
    children = list(element)
    if children:
        key = "_" + str(element.tag) if simple else "_children"
        out[key] = [_xml_element_to_map(c, simple) for c in children]
    return out


def _xml_root(xml_input: str, path: str):
    # stdlib ElementTree with doctype/entity input refused up front (the
    # reference uses defusedxml for the same purpose; absent here)
    import re
    import xml.etree.ElementTree as ET
    if path:
        with open(path) as f:
            xml_input = f.read()
    if re.search(r"<!(?:DOCTYPE|ENTITY)", xml_input, re.IGNORECASE):
        raise ValueError("XML doctype/entity declarations are refused")
    return ET.fromstring(xml_input)


def _json(value):
    import json
    return json.dumps(value, sort_keys=True)


def _xml_parse(g, xml_input: str, simple: bool = False, path: str = ""):
    """xml_module.parse(xml_input, [simple, path]) YIELD result — the
    reference's map, serialized to a JSON string column (heterogeneous
    nested maps; xml_module.py:48)."""
    root = _xml_root(xml_input, path)
    return g.spark.createDataFrame(
        [(_json(_xml_element_to_map(root, bool(simple))),)], "result string")


def _xml_load(g, source: str, simple: bool = False, xpath: str = "",
              headers=None):
    """xml_module.load(source, [simple, xpath]) YIELD result — one row per
    xpath match (whole document when xpath empty). Local paths only (the
    reference also fetches URLs; no network in this environment)."""
    if source.startswith(("http://", "https://")):
        raise NotImplementedError(
            "xml_module.load: URL fetch requires network access; "
            "pass a local file path")
    root = _xml_root("", source)
    if xpath:
        matches = root.findall(xpath)
    else:
        matches = [root]
    rows = [(_json(_xml_element_to_map(m, bool(simple))),) for m in matches]
    return g.spark.createDataFrame(rows, "result string")


# ---------------------------------------------------------------------------
# llm_util.schema + llm.complete (src/mage/python/llm_util.py, llm.py)
# ---------------------------------------------------------------------------

_SPARK_TO_PY = {
    "string": "str", "bigint": "int", "int": "int", "smallint": "int",
    "tinyint": "int", "double": "float", "float": "float",
    "boolean": "bool", "date": "date", "timestamp": "datetime",
    "timestamp_ntz": "datetime", "binary": "bytes",
}


def _py_type(spark_type: str) -> str:
    if spark_type.startswith("array"):
        return "list"
    if spark_type.startswith(("map", "struct")):
        return "dict"
    return _SPARK_TO_PY.get(spark_type, spark_type)


_INTERNAL_COLS = {"id", "src", "dst", "eid", "labels", "type"}


def _schema_dicts(g):
    node_props = {}
    for label, df in sorted(g.nodes.items()):
        node_props[label] = sorted(
            ({"property": c, "type": _py_type(t)}
             for c, t in df.dtypes if c not in _INTERNAL_COLS),
            key=lambda d: d["property"])
    rel_props = {}
    for etype, df in sorted(g.edges.items()):
        rel_props[etype] = sorted(
            ({"property": c, "type": _py_type(t)}
             for c, t in df.dtypes if c not in _INTERNAL_COLS),
            key=lambda d: d["property"])
    # (start_label, type, end_label) triples: one distributed join pass
    # against the id->label union (the only part not derivable from
    # DataFrame metadata)
    id_label = None
    for label, df in g.nodes.items():
        part = df.select(F.col("id"), F.lit(label).alias("_lbl"))
        id_label = part if id_label is None else id_label.unionByName(part)
    rels = []
    if id_label is not None:
        for etype, df in sorted(g.edges.items()):
            pairs = (df.select("src", "dst")
                     .join(id_label.withColumnsRenamed(
                         {"id": "src", "_lbl": "_s"}), "src")
                     .join(id_label.withColumnsRenamed(
                         {"id": "dst", "_lbl": "_e"}), "dst")
                     .select("_s", "_e").distinct().collect())
            rels += [{"start": r["_s"], "type": etype, "end": r["_e"]}
                     for r in sorted(pairs)]
    return node_props, rel_props, rels


def _llm_util_schema(g, output_type: str = "prompt_ready"):
    """llm_util.schema([output_type]) YIELD schema — 'prompt_ready' text or
    'raw' JSON (llm_util.py:133-155)."""
    node_props, rel_props, rels = _schema_dicts(g)
    ot = str(output_type).lower()
    if ot == "raw":
        out = _json({"node_props": node_props, "rel_props": rel_props,
                     "relationships": rels})
    elif ot == "prompt_ready":
        lines = ["Node properties are the following:"]
        for label, props in node_props.items():
            lines.append(
                f"Node name: '{label}', Node properties: {props}")
        lines.append("")
        lines.append("Relationship properties are the following:")
        for etype, props in rel_props.items():
            lines.append(
                f"Relationship name: '{etype}', Relationship properties: "
                f"{props}")
        lines.append("")
        lines.append("The relationships are the following:")
        for r in rels:
            lines.append(f"['(:{r['start']})-[:{r['type']}]->"
                         f"(:{r['end']})']")
        out = "\n".join(lines) + "\n"
    else:
        raise ValueError(
            "output_type must be 'prompt_ready' or 'raw'")
    return g.spark.createDataFrame([(out,)], "schema string")


def _llm_complete(g, text: str, config=None):
    """llm.complete(text, [config]) YIELD completion — calls an
    OpenAI-compatible chat endpoint at config.api_base (llm.py:31). Gated:
    raises unless an api_base/LLM_API_BASE is configured (no network in the
    test environment)."""
    config = dict(config or {})
    api_base = config.get("api_base") or os.environ.get("LLM_API_BASE")
    if not api_base:
        raise NotImplementedError(
            "llm.complete requires an LLM endpoint: set config.api_base or "
            "LLM_API_BASE (and the provider API key)")
    import json
    import urllib.request
    payload = {
        "model": config.get("model",
                            os.environ.get("LITELLM_MODEL", "default")),
        "messages": ([{"role": "system",
                       "content": config["system_prompt"]}]
                     if config.get("system_prompt") else [])
        + [{"role": "user", "content": text}],
    }
    req = urllib.request.Request(
        api_base.rstrip("/") + "/chat/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json",
                 **({"Authorization": "Bearer " + config["api_key"]}
                    if config.get("api_key") else {})})
    with urllib.request.urlopen(req) as resp:
        body = json.load(resp)
    out = body["choices"][0]["message"]["content"]
    return g.spark.createDataFrame([(out,)], "completion string")


register("graph_analyzer.help", _ga_help)
register("graph_analyzer.analyze", _ga_analyze)
register("graph_analyzer.analyze_subgraph", _ga_analyze_subgraph)
register("temporal.format", _temporal_format)
register("xml_module.parse", _xml_parse)
register("xml_module.load", _xml_load)
register("llm_util.schema", _llm_util_schema)
register("llm.complete", _llm_complete)
