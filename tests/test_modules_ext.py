"""Utility-module batch 2 tests: path / merge / nodes / search /
connectivity / distance_calculator / csv_utils / date / graph_util / schema
(src/mage/cpp/*_module, query_modules/{date.py,schema.cpp,convert.cpp})."""

from __future__ import annotations

import os
import tempfile

import pytest

from memgraph_spark.catalog import graph_for, load_tpch_graph
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE

NATION0 = 144115188075855872   # Nation key 0 ((label_code << 56) + key)


@pytest.fixture(scope="module")
def gs(spark):
    return GraphSession(graph_for(spark, SF_SMOKE))


@pytest.fixture(scope="module")
def wgs(spark):
    # fresh graph for write procedures
    return GraphSession(load_tpch_graph(spark, SF_SMOKE))


def test_path_expand(gs):
    rows = gs.execute(
        f"CALL path.expand({NATION0}, ['IN_REGION>'], [], 0, 1) "
        "YIELD result RETURN result").collect()
    # depth-0 (just the start) + one IN_REGION hop
    sizes = sorted(len(r.result.nodes) for r in rows)
    assert sizes == [1, 2]


def test_path_expand_label_deny(gs):
    rows = gs.execute(
        f"CALL path.expand({NATION0}, [], ['-Region'], 1, 1) "
        "YIELD result RETURN result").collect()
    assert rows, "expected non-Region neighbours"
    assert all(len(r.result.rels) == 1 for r in rows)


def test_path_subgraph_nodes(gs):
    rows = gs.execute(
        f"CALL path.subgraph_nodes({NATION0}, "
        "{relationshipFilter: ['IN_REGION>'], maxHops: 1}) "
        "YIELD node RETURN count(*) AS n").collect()
    assert rows[0].n == 2  # the nation + its region


def test_path_subgraph_all(gs):
    rows = gs.execute(
        f"CALL path.subgraph_all({NATION0}, "
        "{relationshipFilter: ['IN_REGION>'], maxHops: 1}) "
        "YIELD nodes, rels RETURN size(nodes) AS nn, size(rels) AS nr"
    ).collect()
    assert rows[0].nn == 2 and rows[0].nr == 1


def test_path_functions(gs):
    rows = gs.execute(
        "MATCH p = (n:Nation {key: 0})-[:IN_REGION]->(:Region) "
        "RETURN path.elements(p) AS els, "
        "path.slice(p, 0, 1) AS sl").collect()
    assert len(rows) == 1
    els = rows[0].els
    assert len(els) == 3  # node, rel, node
    assert els[0].node is not None and els[0].relationship is None
    assert els[1].relationship is not None
    assert len(rows[0].sl.nodes) == 2 and len(rows[0].sl.rels) == 1


def test_path_combine(gs):
    rows = gs.execute(
        "MATCH p = (n:Nation {key: 0})-[:IN_REGION]->(:Region) "
        "RETURN path.combine(p, p) AS c").collect()
    # combine shares the join node: 3 nodes, 2 rels
    assert len(rows[0].c.nodes) == 3 and len(rows[0].c.rels) == 2


def test_merge_node(wgs):
    r1 = wgs.execute(
        "CALL merge.node(['MPerson'], {name: 'Zed'}, {age: 1}, {age: 2}) "
        "YIELD node RETURN node").collect()
    r2 = wgs.execute(
        "CALL merge.node(['MPerson'], {name: 'Zed'}, {age: 1}, {age: 2}) "
        "YIELD node RETURN node").collect()
    assert r1[0].node == r2[0].node
    age = wgs.execute("MATCH (p:MPerson {name: 'Zed'}) RETURN p.age AS age"
                      ).collect()[0].age
    assert age == 2  # second call took the ON MATCH branch


def test_nodes_link_and_relationship_types(wgs):
    ids = [r.id for r in wgs.execute(
        "UNWIND [1, 2, 3] AS i CREATE (n:LinkT {ord: i}) RETURN id(n) AS id"
    ).collect()]
    wgs.execute(
        f"CALL nodes.link({ids}, 'NEXT') YIELD ok RETURN ok").collect()
    chained = wgs.execute(
        "MATCH (:LinkT)-[r:NEXT]->(:LinkT) RETURN count(*) AS n"
    ).collect()[0].n
    assert chained == 2
    rt = wgs.execute(
        f"CALL nodes.relationship_types({ids[1]}) "
        "YIELD node, relationship_types RETURN relationship_types AS t"
    ).collect()[0].t
    assert "NEXT" in rt.out_types and "NEXT" in rt.in_types


def test_nodes_relationships_exist(wgs):
    ids = sorted(r.id for r in wgs.execute(
        "MATCH (n:LinkT) RETURN id(n) AS id, n.ord AS o ORDER BY o"
    ).collect())
    first = [r.id for r in wgs.execute(
        "MATCH (n:LinkT) WHERE n.ord = 1 RETURN id(n) AS id").collect()][0]
    res = wgs.execute(
        f"CALL nodes.relationships_exist([{first}], ['NEXT>', '<NEXT']) "
        "YIELD node, result RETURN result").collect()[0].result
    assert res["NEXT>"] is True and res["<NEXT"] is False


def test_nodes_delete(wgs):
    wgs.execute("CREATE (n:DelT {k: 1})").collect()
    nid = wgs.execute("MATCH (n:DelT) RETURN id(n) AS id").collect()[0].id
    wgs.execute(f"CALL nodes.delete({nid}) YIELD ok RETURN ok").collect()
    left = wgs.execute("MATCH (n:DelT) RETURN count(*) AS n").collect()[0].n
    assert left == 0


def test_search_node(gs):
    rows = gs.execute(
        "CALL search.node({Region: ['name']}, 'contains', 'ROP') "
        "YIELD node RETURN count(*) AS n").collect()
    assert rows[0].n == 1  # EUROPE


def test_search_invalid_operator(gs):
    with pytest.raises(Exception, match="invalid"):
        gs.execute(
            "CALL search.node({Region: ['name']}, 'approx', 'x') "
            "YIELD node RETURN node").collect()


def test_connectivity(gs):
    rows = gs.execute(
        "CALL connectivity.get() YIELD node_id, component_id "
        "RETURN count(DISTINCT component_id) AS c").collect()
    assert rows[0].c == 1


def test_csv_utils(gs):
    path = os.path.join(tempfile.gettempdir(), "mg_csv_utils_test.csv")
    gs.execute(
        f"CALL csv_utils.create_csv_file('{path}', 'a,b\\n1,2\\n', false) "
        "YIELD filepath RETURN filepath").collect()
    assert open(path).read().startswith("a,b")
    gs.execute(
        f"CALL csv_utils.delete_csv_file('{path}') YIELD ok RETURN ok"
    ).collect()
    assert not os.path.exists(path)


def test_date_parse_format_roundtrip(gs):
    parsed = gs.execute(
        "CALL date.parse('2024-03-01 10:30:00', 's', "
        "'%Y-%m-%d %H:%M:%S', 'UTC') YIELD parsed RETURN parsed"
    ).collect()[0].parsed
    fmt = gs.execute(
        f"CALL date.format({parsed}, 's', '%Y-%m-%d %H:%M:%S', 'UTC') "
        "YIELD formatted RETURN formatted").collect()[0].formatted
    assert fmt == "2024-03-01 10:30:00"


def test_date_add_function(gs):
    rows = gs.execute(
        "RETURN date.add(100, 's', 2, 'm') AS v").collect()
    assert rows[0].v == 220  # 100s + 2min = 220s


def test_math_round_modes(gs):
    rows = gs.execute(
        "RETURN math.round(2.5) AS up, math.round(2.5, 0, 'HALF_DOWN') AS hd, "
        "math.round(2.5, 0, 'HALF_EVEN') AS he, "
        "math.round(-2.5, 0, 'CEILING') AS ce, "
        "math.round(2.345, 2) AS p2").collect()
    r = rows[0]
    assert r.up == 3.0 and r.hd == 2.0 and r.he == 2.0
    assert r.ce == -2.0 and abs(r.p2 - 2.35) < 1e-9


def test_convert_json(gs):
    rows = gs.execute(
        """RETURN convert.to_json([1, 2, 3]) AS j,
                  convert.str2object('{"a": 1}') AS o""").collect()
    assert rows[0].j == "[1,2,3]"
    assert '"a":1' in str(rows[0].o).replace(" ", "")


def test_graph_util_ancestors_descendants(gs):
    anc = gs.execute(
        f"CALL graph_util.ancestors({NATION0 - 144115188075855872 + 72057594037927936}) "
        "YIELD ancestors RETURN size(ancestors) AS n").collect()[0].n
    assert anc > 0  # Region 0 is reachable from its nations and their spokes
    desc = gs.execute(
        f"CALL graph_util.descendants({NATION0}) "
        "YIELD descendants RETURN size(descendants) AS n").collect()[0].n
    assert desc == 1  # nation -> its region only


def test_graph_util_connect_nodes(gs):
    region = gs.execute(
        "MATCH (n:Nation {key: 0})-[:IN_REGION]->(r:Region) "
        "RETURN id(r) AS rid").collect()[0].rid
    rows = gs.execute(
        f"CALL graph_util.connect_nodes([{NATION0}, {region}]) "
        "YIELD connections RETURN connections AS c").collect()
    assert len(rows) == 1 and rows[0].c.type == "IN_REGION"


def test_graph_util_chain_nodes(wgs):
    ids = [r.id for r in wgs.execute(
        "UNWIND [1, 2] AS i CREATE (n:ChainT {ord: i}) RETURN id(n) AS id"
    ).collect()]
    rows = wgs.execute(
        f"CALL graph_util.chain_nodes({ids}, 'CHAINED') "
        "YIELD connections RETURN connections AS c").collect()
    assert len(rows) == 1 and rows[0].c.type == "CHAINED"
    n = wgs.execute("MATCH (:ChainT)-[:CHAINED]->(:ChainT) "
                    "RETURN count(*) AS n").collect()[0].n
    assert n == 1


def test_schema_node_type_properties(gs):
    rows = gs.execute(
        "CALL schema.node_type_properties() "
        "YIELD nodeType, nodeLabels, propertyName, propertyTypes, mandatory "
        "RETURN nodeType, propertyName, propertyTypes, mandatory "
        "ORDER BY nodeType, propertyName").collect()
    by_label = {(r.nodeType, r.propertyName): r for r in rows}
    key = by_label[(":`Region`", "name")]
    assert key.propertyTypes == ["String"] and key.mandatory is True


def test_schema_rel_type_properties(gs):
    rows = gs.execute(
        "CALL schema.rel_type_properties() "
        "YIELD relType, propertyName, propertyTypes, mandatory "
        "RETURN relType, propertyName ORDER BY relType, propertyName"
    ).collect()
    assert any(r.relType == ":`CONTAINS`" for r in rows)


def test_schema_assert(wgs):
    rows = wgs.execute(
        "CALL schema.assert({AssertL: ['p']}, {}, {}, true) "
        "YIELD action, label, key RETURN action, label, key").collect()
    assert rows[0].action == "Created" and rows[0].label == "AssertL"
    rows = wgs.execute(
        "CALL schema.assert({}, {}, {}, true) "
        "YIELD action, label, key RETURN action, label, key").collect()
    assert any(r.action == "Dropped" and r.label == "AssertL" for r in rows)
