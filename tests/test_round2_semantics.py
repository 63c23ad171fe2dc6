"""Round-2 semantic pins: hops-limit replay, subquery apply, text fuzzy,
optional-match scoping — compact invariants so plain pytest catches
regressions without the full gql_behave corpus."""

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession


@pytest.fixture()
def gs(spark):
    return GraphSession(PropertyGraph(spark, nodes={}, edges={}))


def _tree(gs):
    gs.execute(
        "CREATE (a:Node {name: 'A'}), (b:Node {name: 'B'}),"
        " (c:Node {name: 'C'}), (d:Node {name: 'D'}), (e:Node {name: 'E'}),"
        " (f:Node {name: 'F'}), (g:Node {name: 'G'}),"
        " (a)-[:CONNECTED]->(b), (a)-[:CONNECTED]->(c),"
        " (b)-[:CONNECTED]->(d), (b)-[:CONNECTED]->(e),"
        " (c)-[:CONNECTED]->(f), (c)-[:CONNECTED]->(g)")


def test_hops_limit_dfs_partial(gs):
    _tree(gs)
    rows = gs.execute(
        "USING HOPS LIMIT 5 MATCH p=(a)-[:CONNECTED *]->(e) "
        "RETURN size(relationships(p)) AS n").collect()
    # retrieval-quota accounting: A(2) + B(2) + D-clip(0, D is a leaf);
    # 5th retrieval lands on C's list mid-stream
    assert 1 <= len(rows) <= 6
    assert gs.last_hops["used"] <= 5


def test_hops_counter_lazy_limit(gs):
    gs.execute("UNWIND range(1, 20) as x CREATE ()-[:NEXT]->()")
    n = gs.execute(
        "USING HOPS LIMIT 100 CALL { MATCH (a)-[r]->(b) WITH a, r, b "
        "LIMIT 5 return count(*) as cnt } "
        "RETURN getHopsCounter() as counter").first()[0]
    assert n == 5


def test_write_subquery_sequential_visibility(gs):
    gs.execute("CREATE (:Counter {count: 0})")
    rows = gs.execute(
        "UNWIND [0, 1, 2] AS x CALL { MATCH (n:Counter) "
        "SET n.count = n.count + 1 RETURN n.count AS c } "
        "WITH c MATCH (n:Counter) RETURN c, n.count AS total "
        "ORDER BY c").collect()
    assert [(r.c, r.total) for r in rows] == [(1, 3), (2, 3), (3, 3)]


def test_text_fuzzy_search_transpositions(gs):
    gs.execute("CREATE TEXT INDEX fz ON :Doc")
    gs.execute("CREATE (:Doc {t: 'memgraph'}) CREATE (:Doc {t: 'coffee'})")
    hit = gs.execute(
        "CALL text_search.search('fz', 'data.t:memgrahp', "
        "{fuzzy_distance: 1}) YIELD node RETURN node.t AS t").collect()
    assert [r.t for r in hit] == ["memgraph"]
    miss = gs.execute(
        "CALL text_search.search('fz', 'data.t:memgrahp', "
        "{fuzzy_distance: 1, fuzzy_transpositions: false}) "
        "YIELD node RETURN node.t AS t").collect()
    assert miss == []


def test_leading_optional_match_yields_null_row(gs):
    rows = gs.execute("OPTIONAL MATCH (a:Nope) RETURN a").collect()
    assert len(rows) == 1 and rows[0].a is None


def test_var_length_cross_segment_uniqueness(gs):
    gs.execute("CREATE (n0:N), (n1:N), (n0)-[:E]->(n1)")
    n = gs.execute(
        "MATCH ()-[r:E]-() "
        "MATCH p = (a)-[*0..1]-()-[r]-()-[*0..1]-(b) "
        "RETURN count(p) AS c").first()[0]
    # the only :E edge is consumed by r, so both var-length segments must
    # stay empty: 2 orientations x 1 path each x 2 pulls of r
    assert n == 4


def test_lambda_anchored_pattern_comprehension(gs):
    gs.execute("CREATE (x:X), (y1:Y), (y2:Y), (x)-[:T]->(y1), "
               "(x)-[:T]->(y2)")
    row = gs.execute(
        "MATCH p = (n:X)-->(b) "
        "RETURN [v IN nodes(p) | size([(v)-->(:Y) | 1])] AS l "
        "LIMIT 1").first()
    assert sorted(row.l) == [0, 2]


def test_merge_on_create_sees_outer_row(gs):
    gs.execute("CREATE (:P {b: 'NY'}) CREATE (:P {b: 'OH'})")
    gs.execute("MATCH (p:P) MERGE (c:City) ON CREATE SET c.name = p.b")
    names = [r.n for r in
             gs.execute("MATCH (c:City) RETURN c.name AS n").collect()]
    assert names == ["NY"]
