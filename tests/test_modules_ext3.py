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


def test_cugraph_hits(spark):
    # two hubs pointing at one authority
    g = PropertyGraph(spark, edges={"E": spark.createDataFrame(
        [(1, 3, 1), (2, 3, 2)], "src long, dst long, eid long")},
        nodes={"N": spark.createDataFrame([(1,), (2,), (3,)], "id long")})
    rows = {r["node"]: (r["hubs"], r["authorities"])
            for r in PROCEDURES["cugraph.hits.get"](g).collect()}
    assert rows[3][1] > 0.99           # node 3 is the authority
    assert abs(rows[1][0] - rows[2][0]) < 1e-9 and rows[1][0] > 0.7
    assert rows[3][0] == 0.0


def test_cugraph_rmat_and_aliases(spark):
    g = PropertyGraph(spark)
    [row] = PROCEDURES["cugraph.generator.rmat"](g, 4, 50).collect()
    assert row["edges"] == 50 and 0 < row["nodes"] <= 16 * 2
    assert "RMAT" in g.nodes and "RELATIONSHIP" in g.edges
    # aliases resolve to the distributed CPU implementations
    assert PROCEDURES["cugraph.pagerank.get"] is PROCEDURES["pagerank.get"]
    r = PROCEDURES["cugraph.pagerank.get"](g).collect()
    assert len(r) == row["nodes"]
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        PROCEDURES["cugraph.spectral_clustering.get"](g)
