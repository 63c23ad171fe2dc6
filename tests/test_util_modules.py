"""MAGE utility modules: collections/map/text magic functions + neighbors/
meta/label/node procedures (reference src/mage/cpp/*_module)."""

import pytest

from memgraph_spark.catalog import graph_for, load_tpch_graph
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def gs(spark):
    return GraphSession(graph_for(spark, SF_SMOKE))


def _one(gs, expr_sql):
    return gs.execute(f"RETURN {expr_sql} AS x").collect()[0].x


def test_collections_functions(gs):
    assert _one(gs, "collections.sum([1.0, 2.0, 3.5])") == 6.5
    assert _one(gs, "collections.sum_longs([1, 2, 3])") == 6
    assert _one(gs, "collections.avg([2, 4])") == 3.0
    assert _one(gs, "collections.max([3, 1, 2])") == 3
    assert _one(gs, "collections.min([3, 1, 2])") == 1
    assert _one(gs, "collections.sort([3, 1, 2])") == [1, 2, 3]
    assert _one(gs, "collections.to_set([1, 2, 2, 1])") == [1, 2]
    assert _one(gs, "collections.contains([1, 2], 2)") is True
    assert _one(gs, "collections.contains_all([1, 2, 3], [1, 3])") is True
    assert _one(gs, "collections.contains_all([1, 2], [1, 4])") is False
    assert _one(gs, "collections.intersection([1, 2, 3], [2, 3, 4])") == [2, 3]
    assert sorted(_one(gs, "collections.union([1, 2], [2, 3])")) == [1, 2, 3]
    assert _one(gs, "collections.union_all([1, 2], [2, 3])") == [1, 2, 2, 3]
    assert _one(gs, "collections.subtract([1, 2, 3], [2])") == [1, 3]
    assert sorted(_one(gs, "collections.disjunction([1, 2], [2, 3])")) == [1, 3]
    assert _one(gs, "collections.remove_all([1, 2, 1, 3], [1])") == [2, 3]
    assert _one(gs, "collections.duplicates([1, 2, 1, 3, 3])") == [1, 3]
    assert _one(gs, "collections.pairs([1, 2, 3])") == [[1, 2], [2, 3]]
    assert _one(gs, "collections.partition([1, 2, 3, 4, 5], 2)") == \
        [[1, 2], [3, 4], [5]]
    assert _one(gs, "collections.flatten([[1, 2], [3]])") == [1, 2, 3]


def test_map_functions(gs):
    assert _one(gs, "map.from_pairs([['a', 'x'], ['b', 'y']])") == \
        {"a": "x", "b": "y"}  # heterogeneous pair values need variant columns
    assert _one(gs, "map.from_lists(['a', 'b'], [1, 2])") == {"a": 1, "b": 2}
    assert _one(gs, "map.from_values(['a', 'x', 'b', 'y'])") == \
        {"a": "x", "b": "y"}
    # map.* operates on MAP columns (Cypher {..} literals compile to structs
    # in our engine, so the tests compose the map constructors)
    assert _one(gs, "map.merge(map.from_lists(['a', 'b'], [1, 2]), "
                    "map.from_lists(['b', 'c'], [9, 3]))") == \
        {"a": 1, "b": 9, "c": 3}
    assert _one(gs, "map.set_key(map.from_lists(['a'], [1]), 'b', 5)") == \
        {"a": 1, "b": 5}
    assert _one(gs, "map.remove_key(map.from_lists(['a', 'b'], [1, 2]), "
                    "'a')") == {"b": 2}
    assert _one(gs, "map.remove_keys(map.from_lists(['a', 'b', 'c'], "
                    "[1, 2, 3]), ['a', 'c'])") == {"b": 2}
    assert _one(gs, "map.merge_list([map.from_lists(['a'], [1]), "
                    "map.from_lists(['b'], [2]), map.from_lists(['a'], [9])])"
                    ) == {"a": 9, "b": 2}


def test_text_functions(gs):
    assert _one(gs, "text.join(['a', 'b', 'c'], '-')") == "a-b-c"
    assert _one(gs, "text.replace('axbxc', 'x', '.')") == "a.b.c"
    assert _one(gs, "text.regreplace('a1b22c', '[0-9]+', '#')") == "a#b#c"
    assert _one(gs, "text.distance('kitten', 'sitting')") == 3
    assert _one(gs, "text.indexOf('hello', 'll')") == 2
    assert _one(gs, "text.indexOf('hello', 'zz')") == -1
    assert _one(gs, "text.compare_cleaned('Ab c!', 'ab-C')") is True
    assert _one(gs, "text.format('x={} y={}', [1, 2])") == "x=1 y=2"
    assert _one(gs, "util_module.md5('abc')") == \
        "900150983cd24fb0d6963f7d28e17f72"


def test_neighbors_procedures(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    g.edges = {"E": spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long")}
    g._adj_cache.clear()
    s = GraphSession(g)
    rows = s.execute("CALL neighbors.at_hop(1, null, 2) YIELD nodes "
                     "RETURN nodes").collect()
    assert [r.nodes for r in rows] == [3]
    rows = s.execute("CALL neighbors.by_hop(1, null, 3) YIELD nodes "
                     "RETURN nodes").collect()
    assert [r.nodes for r in rows] == [[2], [3], [4]]
    rows = s.execute("CALL node.relationship_types(2) "
                     "YIELD relationship_types AS t RETURN t").collect()
    assert rows[0].t == ["E"]
    rows = s.execute("CALL node.relationship_exists(4) "
                     "YIELD exists AS ex RETURN ex").collect()
    assert rows[0].ex is True


def test_meta_stats(gs):
    rows = gs.execute("CALL meta.stats_offline() YIELD node_count, "
                      "relationship_count, labels RETURN *").collect()
    assert rows[0].node_count > 0 and rows[0].relationship_count > 0
    assert rows[0].labels.get("Region") == 5


def test_label_exists(gs):
    nid = gs.execute("MATCH (n:Region) RETURN id(n) AS i ORDER BY i LIMIT 1") \
        .collect()[0].i
    r = gs.execute("CALL label.exists($id, 'Region') YIELD exists AS ex "
                   "RETURN ex", params={"id": nid}).collect()
    assert r[0].ex is True
    r = gs.execute("CALL label.exists($id, 'Part') YIELD exists AS ex "
                   "RETURN ex", params={"id": nid}).collect()
    assert r[0].ex is False
