"""gnn.pyg_export/pyg_import/tf_export/tf_import (reference
src/mage/python/gnn.py): whole-graph JSON interchange, size-guarded
collect on export, bulk table-version swaps on import."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph


def _graph(spark):
    return PropertyGraph(
        spark,
        nodes={"P": spark.createDataFrame(
            [(1, "ana", 0), (2, "bob", 1), (3, "cat", 0)],
            "id long, name string, cls long")},
        edges={"KNOWS": spark.createDataFrame(
            [(1, 2, 0.5), (2, 3, 0.9)], "src long, dst long, w double")})


def test_pyg_export_shape(spark):
    from memgraph_spark.gnn_io import pyg_export
    g = _graph(spark)
    d = json.loads(pyg_export(g, ["name"], ["w"], "cls")
                   .collect()[0].json_data)
    assert d["num_nodes"] == 3
    assert d["edge_index"] == [[0, 1], [1, 2]]
    assert d["x"]["name"] == ["ana", "bob", "cat"]
    assert d["edge_attr"]["w"] == [0.5, 0.9]
    assert d["y"] == [0, 1, 0]
    assert d["labels"] == [["P"], ["P"], ["P"]]
    assert d["edge_types"] == ["KNOWS", "KNOWS"]
    assert d["idx_to_node_id"]["0"] == 1


def test_pyg_round_trip(spark):
    from memgraph_spark.gnn_io import pyg_export, pyg_import
    g = _graph(spark)
    payload = pyg_export(g, ["name"], ["w"], "cls").collect()[0].json_data
    g2 = PropertyGraph(spark, nodes={}, edges={})
    r = pyg_import(g2, payload).collect()[0]
    assert (r.nodes_created, r.edges_created) == (3, 2)
    assert g2.node("P").count() == 3
    names = sorted(r2.name for r2 in g2.node("P").collect())
    assert names == ["ana", "bob", "cat"]
    e = g2.edge("KNOWS")
    assert e.count() == 2
    assert sorted(round(r2.w, 2) for r2 in e.collect()) == [0.5, 0.9]


def test_tf_round_trip(spark):
    from memgraph_spark.gnn_io import tf_export, tf_import
    g = _graph(spark)
    payload = tf_export(g, ["name"], ["w"]).collect()[0].json_data
    d = json.loads(payload)
    assert d["node_sets"]["node"]["sizes"] == [3]
    assert d["edge_sets"]["edge"]["adjacency"]["source"] == [0, 1]
    g2 = PropertyGraph(spark, nodes={}, edges={})
    r = tf_import(g2, payload).collect()[0]
    assert (r.nodes_created, r.edges_created) == (3, 2)
    assert g2.node("P").count() == 3


def test_export_guard(spark, monkeypatch):
    import memgraph_spark.gnn_io as GIO
    monkeypatch.setattr(GIO, "GNN_IO_MAX_ELEMENTS", 2)
    g = _graph(spark)
    with pytest.raises(ValueError, match="GNN_IO_MAX_ELEMENTS"):
        GIO.pyg_export(g)


def test_procedure_surface(spark):
    from memgraph_spark.plans import GraphSession
    g = _graph(spark)
    gs = GraphSession(g)
    rows = gs.execute("CALL gnn.pyg_export(['name'], ['w'], 'cls') "
                      "YIELD json_data RETURN json_data").collect()
    d = json.loads(rows[0].json_data)
    assert d["num_nodes"] == 3
    rows = gs.execute("CALL gnn.tf_export() YIELD json_data "
                      "RETURN json_data").collect()
    assert json.loads(rows[0].json_data)["node_sets"]["node"]["sizes"] == [3]


def test_import_rejects_out_of_range_edge_index(spark):
    """ADVICE r4: an edge_index entry outside [0, num_nodes) must raise
    instead of minting a dangling edge with the raw index as a node id."""
    from memgraph_spark.gnn_io import pyg_import
    g = PropertyGraph(spark, nodes={}, edges={})
    bad = json.dumps({"num_nodes": 2, "edge_index": [[0, 5], [1, 0]]})
    with pytest.raises(ValueError, match="node indexes outside"):
        pyg_import(g, bad)
