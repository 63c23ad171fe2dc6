"""Batch-4 module parity: meta_util.schema, mgps shim, connector gates."""

import json

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.procedures import PROCEDURES


def _g(spark):
    return PropertyGraph(
        spark,
        nodes={"P": spark.createDataFrame(
            [(1, "a"), (2, None)], "id long, name string")},
        edges={"R": spark.createDataFrame(
            [(1, 2, 7, 3.0)], "src long, dst long, eid long, w double")})


def test_meta_util_schema(spark):
    g = _g(spark)
    [row] = PROCEDURES["meta_util.schema"](g, True).collect()
    nodes = [json.loads(x) for x in row["nodes"]]
    rels = [json.loads(x) for x in row["relationships"]]
    assert nodes == [{"labels": ["P"], "count": 2,
                      "properties_count": {"name": 1}}]
    assert rels[0]["type"] == "R" and rels[0]["count"] == 1
    assert rels[0]["properties_count"] == {"w": 1}
    [row] = PROCEDURES["meta_util.schema"](g).collect()
    assert "properties_count" not in json.loads(row["nodes"][0])


def test_mgps_shim(spark):
    g = _g(spark)
    rows = PROCEDURES["mgps.components"](g).collect()
    assert {r["name"] for r in rows} == {"Memgraph", "Neo4j Kernel"}
    assert PROCEDURES["mgps.await_indexes"](g, 10).count() == 0
    assert PROCEDURES["mgps.validate"](g, False, "m", []).count() == 0
    with pytest.raises(ValueError, match="bad thing 7"):
        PROCEDURES["mgps.validate"](g, True, "bad thing %s", [7])


def test_connector_gates(spark):
    g = _g(spark)
    for name in ("cross_database.neo4j", "cross_database.mysql",
                 "elastic_search.search", "embeddings.compute"):
        with pytest.raises(NotImplementedError):
            PROCEDURES[name](g)
