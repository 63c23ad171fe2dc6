"""refactor.* batch-2 parity (reference src/mage/cpp/refactor_module):
graph surgery as table-version swaps."""

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.procedures import PROCEDURES


def _g(spark):
    nodes = {
        "P": spark.createDataFrame(
            [(1, "a", "US"), (2, "b", "US"), (3, "c", "EU")],
            "id long, name string, country string"),
        "Q": spark.createDataFrame([(9, "hub")], "id long, name string"),
    }
    edges = {
        "R": spark.createDataFrame(
            [(1, 2, 100, 5.0), (2, 3, 101, 7.0)],
            "src long, dst long, eid long, w double"),
    }
    return PropertyGraph(spark, nodes=nodes, edges=edges)


def _edges(g, etype="R"):
    return {r["eid"]: (r["src"], r["dst"])
            for r in g.edges[etype].collect()}


def test_from_to_invert(spark):
    g = _g(spark)
    PROCEDURES["refactor.from"](g, 100, 3).collect()
    assert _edges(g)[100] == (3, 2)
    PROCEDURES["refactor.to"](g, 100, 1).collect()
    assert _edges(g)[100] == (3, 1)
    rows = PROCEDURES["refactor.invert"](g, 101).collect()
    assert rows[0]["error"] is None and _edges(g)[101] == (3, 2)
    rows = PROCEDURES["refactor.invert"](g, 999).collect()
    assert rows[0]["error"] is not None


def test_rename_type_property(spark):
    g = _g(spark)
    [row] = PROCEDURES["refactor.rename_type_property"](
        g, "w", "weight").collect()
    assert row["relationships_changed"] == 2
    assert "weight" in g.edges["R"].columns
    assert "w" not in g.edges["R"].columns


def test_normalize_as_boolean(spark):
    g = _g(spark)
    g.set_node_version("P", g.nodes["P"].selectExpr(
        "id", "name", "country",
        "CASE WHEN id = 1 THEN 'yes' WHEN id = 2 THEN 'no' "
        "ELSE 'maybe' END AS flag"))
    PROCEDURES["refactor.normalize_as_boolean"](
        g, [1, 2, 3], "flag", ["yes"], ["no"]).collect()
    vals = {r["id"]: r["flag"] for r in g.nodes["P"].collect()}
    assert vals == {1: True, 2: False, 3: None}


def test_collapse_node(spark):
    g = _g(spark)
    # node 2 has exactly one in (100) and one out (101)
    [row] = PROCEDURES["refactor.collapse_node"](g, [2], "VIA").collect()
    assert row["id_collapsed"] == 2
    via = g.edges["VIA"].collect()
    assert len(via) == 1 and (via[0]["src"], via[0]["dst"]) == (1, 3)
    assert via[0]["w"] in (5.0, 7.0)  # combined props (out wins on clash)
    assert _edges(g) == {}
    assert g.nodes["P"].filter("id = 2").count() == 0


def test_extract_node(spark):
    g = _g(spark)
    [row] = PROCEDURES["refactor.extract_node"](
        g, [100], ["Meeting"], "OUT", "IN").collect()
    assert row["input"] == 100 and row["error"] is None
    new_id = row["output"]
    m = g.nodes["Meeting"].collect()
    assert len(m) == 1 and m[0]["w"] == 5.0
    assert [(r["src"], r["dst"]) for r in g.edges["OUT"].collect()] == \
        [(1, new_id)]
    assert [(r["src"], r["dst"]) for r in g.edges["IN"].collect()] == \
        [(new_id, 2)]
    assert 100 not in _edges(g)


def test_delete_and_reconnect(spark):
    g = _g(spark)
    [row] = PROCEDURES["refactor.delete_and_reconnect"](g, [2]).collect()
    assert 2 not in row["nodes"] and 1 in row["nodes"]
    assert len(row["relationships"]) == 1
    # incoming strategy: new edge keeps the incoming edge's type + props
    new = g.edges["R"].filter(~g.edges["R"]["eid"].isin([100, 101]))
    [e] = new.collect()
    assert (e["src"], e["dst"], e["w"]) == (1, 3, 5.0)


def test_categorize(spark):
    g = _g(spark)
    [row] = PROCEDURES["refactor.categorize"](
        g, "country", "IN_COUNTRY", True, "Country", "name").collect()
    assert row["status"] == "success"
    cats = {r["name"]: r["id"] for r in g.nodes["Country"].collect()}
    assert set(cats) == {"US", "EU"}
    links = {(r["src"], r["dst"]) for r in g.edges["IN_COUNTRY"].collect()}
    assert (1, cats["US"]) in links and (3, cats["EU"]) in links
    assert "country" not in g.nodes["P"].columns


def test_clone_nodes(spark):
    g = _g(spark)
    rows = PROCEDURES["refactor.clone_nodes"](g, [1], True, ["name"]).collect()
    [r] = rows
    assert r["input"] == 1 and r["error"] is None
    clone = g.nodes["P"].filter(f"id = {r['output']}").first()
    assert clone["name"] is None and clone["country"] == "US"
    # cloned relationships point at the original neighbours
    assert (r["output"], 2) in {(e["src"], e["dst"])
                                for e in g.edges["R"].collect()}


def test_clone_subgraph_with_standin(spark):
    g = _g(spark)
    rows = PROCEDURES["refactor.clone_subgraph"](
        g, [1, 2], [100], {"standinNodes": [[2, 9]]}).collect()
    out = {r["input"]: r["output"] for r in rows}
    assert 1 in out
    pairs = {(e["src"], e["dst"]) for e in g.edges["R"].collect()}
    assert (out[1], 9) in pairs  # clone of 1 wired to the standin


def test_merge_nodes_combine(spark):
    g = _g(spark)
    [row] = PROCEDURES["refactor.merge_nodes"](g, [1, 3]).collect()
    assert row["node"] == 1
    assert g.nodes["P"].filter("id = 3").count() == 0
    merged = g.nodes["P"].filter("id = 1").first()
    assert sorted(merged["country"]) == ["EU", "US"]  # combine strategy
    # 2->3 redirected to 2->1
    assert (2, 1) in {(e["src"], e["dst"]) for e in g.edges["R"].collect()}


def test_merge_nodes_discard(spark):
    g = _g(spark)
    [row] = PROCEDURES["refactor.merge_nodes"](
        g, [1, 3], {"properties": "discard"}).collect()
    merged = g.nodes["P"].filter("id = 1").first()
    assert merged["country"] == "US" and merged["name"] == "a"
