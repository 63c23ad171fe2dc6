"""Batch-3 module parity: graph_analyzer, temporal.format, xml_module,
llm_util.schema, llm.complete gate (reference
query_modules/graph_analyzer.py, src/mage/python/{temporal,xml_module,
llm_util,llm}.py)."""

import datetime
import json

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.procedures import PROCEDURES


def _graph(spark):
    # Person 1..3, City 10; KNOWS among persons, LIVES_IN person->city
    nodes = {
        "Person": spark.createDataFrame(
            [(1, "ana", 30), (2, "bob", 25), (3, "eve", 41)],
            "id long, name string, age long"),
        "City": spark.createDataFrame([(10, "Zagreb")],
                                      "id long, name string"),
    }
    edges = {
        "KNOWS": spark.createDataFrame(
            [(1, 2, 100, 2015)], "src long, dst long, eid long, since long"),
        "LIVES_IN": spark.createDataFrame(
            [(1, 10, 101), (2, 10, 102)], "src long, dst long, eid long"),
    }
    return PropertyGraph(spark, nodes=nodes, edges=edges)


def test_graph_analyzer_analyze(spark):
    g = _graph(spark)
    rows = PROCEDURES["graph_analyzer.analyze"](g).collect()
    report = {r["name"]: r["value"] for r in rows}
    assert report["Number of nodes"] == "4"
    assert report["Number of edges"] == "3"
    assert report["Is DAG"] == "True"
    assert report["Self loops"] == "0"
    assert report["Is weakly connected"] == "False"  # city 10 + person 3


def test_graph_analyzer_selected_and_unknown(spark):
    g = _graph(spark)
    rows = PROCEDURES["graph_analyzer.analyze"](g, ["nodes", "edges"]).collect()
    assert [r["name"] for r in rows] == ["Number of nodes",
                                        "Number of edges"]
    with pytest.raises(KeyError):
        PROCEDURES["graph_analyzer.analyze"](g, ["nope"])
    assert len(PROCEDURES["graph_analyzer.help"](g).collect()) > 10


def test_graph_analyzer_subgraph(spark):
    g = _graph(spark)
    rows = PROCEDURES["graph_analyzer.analyze_subgraph"](
        g, [1, 2], [100], ["nodes", "edges"]).collect()
    report = {r["name"]: r["value"] for r in rows}
    assert report == {"Number of nodes": "2", "Number of edges": "1"}


def test_temporal_format(spark):
    g = _graph(spark)
    call = PROCEDURES["temporal.format"]
    dt = datetime.datetime(2024, 3, 5, 7, 9, 11)
    assert call(g, dt).collect()[0]["formatted"] == "2024-03-05T07:09:11"
    assert call(g, dt, "%Y/%m/%d").collect()[0]["formatted"] == "2024/03/05"
    td = datetime.timedelta(days=1, hours=2)
    assert call(g, td, "%d %H").collect()[0]["formatted"] == "02 02"
    assert call(g, 42).collect()[0]["formatted"] == "42"
    with pytest.raises(ValueError):
        call(g, dt, "%Y %Z")


def test_xml_parse(spark):
    g = _graph(spark)
    xml = "<a x='1'><b>hi</b><b>yo</b></a>"
    out = json.loads(
        PROCEDURES["xml_module.parse"](g, xml).collect()[0]["result"])
    assert out["_type"] == "a" and out["x"] == "1"
    assert [c["_text"] for c in out["_children"]] == ["hi", "yo"]
    simple = json.loads(PROCEDURES["xml_module.parse"](
        g, xml, True).collect()[0]["result"])
    assert "_a" in simple and "_children" not in simple


def test_xml_load_xpath(spark, tmp_path):
    g = _graph(spark)
    p = tmp_path / "doc.xml"
    p.write_text("<root><item id='1'/><item id='2'/><other/></root>")
    rows = PROCEDURES["xml_module.load"](g, str(p), False, ".//item").collect()
    ids = sorted(json.loads(r["result"])["id"] for r in rows)
    assert ids == ["1", "2"]
    with pytest.raises(NotImplementedError):
        PROCEDURES["xml_module.load"](g, "https://x.test/doc.xml")


def test_llm_util_schema_prompt_ready(spark):
    g = _graph(spark)
    text = PROCEDURES["llm_util.schema"](g).collect()[0]["schema"]
    assert "Node name: 'Person'" in text
    assert "{'property': 'age', 'type': 'int'}" in text
    assert "['(:Person)-[:KNOWS]->(:Person)']" in text
    assert "['(:Person)-[:LIVES_IN]->(:City)']" in text


def test_llm_util_schema_raw(spark):
    g = _graph(spark)
    raw = json.loads(PROCEDURES["llm_util.schema"](
        g, "raw").collect()[0]["schema"])
    assert {"property": "since", "type": "int"} in raw["rel_props"]["KNOWS"]
    assert {"start": "Person", "type": "LIVES_IN",
            "end": "City"} in raw["relationships"]
    with pytest.raises(ValueError):
        PROCEDURES["llm_util.schema"](g, "bogus")


def test_llm_complete_gated(spark, monkeypatch):
    g = _graph(spark)
    monkeypatch.delenv("LLM_API_BASE", raising=False)
    with pytest.raises(NotImplementedError):
        PROCEDURES["llm.complete"](g, "summarize this")
