"""Write-clause tests (SURVEY §2.8): CREATE / SET / REMOVE / DELETE / MERGE
as table-version producers, modeled on the reference's
query_plan_create_set_remove_delete.cpp unit suite."""

from __future__ import annotations

import pytest

from memgraph_spark.catalog import load_tpch_graph
from memgraph_spark.plans import GraphSession
from memgraph_spark.plans.exprs import CompileError
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def gs(spark):
    # fresh graph (not the shared cache): tests mutate table versions
    return GraphSession(load_tpch_graph(spark, SF_SMOKE))


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_create_node_and_scan(gs):
    r = _one(gs.execute(
        "CREATE (p:Person {name: 'Alice', age: 30}) RETURN p.name AS name"))
    assert r.name == "Alice"
    r = _one(gs.execute("MATCH (p:Person) RETURN count(*) AS n"))
    assert r.n == 1


def test_create_per_input_row(gs):
    gs.execute(
        "UNWIND ['Bob', 'Carol'] AS nm CREATE (:Person {name: nm})").collect()
    assert gs.last_summary["nodes_created"] == 2
    names = [r.name for r in gs.execute(
        "MATCH (p:Person) RETURN p.name AS name ORDER BY name").collect()]
    assert names == ["Alice", "Bob", "Carol"]


def test_create_relationship(gs):
    gs.execute(
        "MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'}) "
        "CREATE (a)-[:KNOWS {since: 2020}]->(b)").collect()
    assert gs.last_summary["relationships_created"] == 1
    r = _one(gs.execute(
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) "
        "RETURN a.name AS a, b.name AS b, r.since AS since"))
    assert (r.a, r.b, r.since) == ("Alice", "Bob", 2020)


def test_set_property_persists(gs):
    gs.execute("MATCH (p:Person {name: 'Alice'}) "
               "SET p.age = 31, p.city = 'Oslo'").collect()
    r = _one(gs.execute("MATCH (p:Person {name: 'Alice'}) "
                        "RETURN p.age AS age, p.city AS city"))
    assert (r.age, r.city) == (31, "Oslo")


def test_set_label_and_scan_by_it(gs):
    gs.execute("MATCH (p:Person {name: 'Bob'}) SET p:Admin").collect()
    r = _one(gs.execute("MATCH (p:Admin) RETURN p.name AS name"))
    assert r.name == "Bob"
    r = _one(gs.execute("MATCH (p:Person {name: 'Bob'}) RETURN labels(p) AS l"))
    assert r.l == ["Person", "Admin"]


def test_remove_property(gs):
    gs.execute("MATCH (p:Person {name: 'Alice'}) REMOVE p.city").collect()
    r = _one(gs.execute("MATCH (p:Person {name: 'Alice'}) "
                        "RETURN p.city AS city"))
    assert r.city is None


def test_merge_matches_existing(gs):
    before = _one(gs.execute("MATCH (p:Person) RETURN count(*) AS n")).n
    r = _one(gs.execute("MERGE (p:Person {name: 'Alice'}) RETURN p.age AS age"))
    assert r.age == 31
    after = _one(gs.execute("MATCH (p:Person) RETURN count(*) AS n")).n
    assert after == before


def test_merge_creates_missing_with_on_create(gs):
    r = _one(gs.execute(
        "MERGE (p:Person {name: 'Dave'}) ON CREATE SET p.fresh = true "
        "RETURN p.name AS name, p.fresh AS fresh"))
    assert (r.name, r.fresh) == ("Dave", True)
    # second run matches — no new node
    n = _one(gs.execute("MATCH (p:Person) RETURN count(*) AS n")).n
    gs.execute("MERGE (p:Person {name: 'Dave'})").collect()
    assert _one(gs.execute("MATCH (p:Person) RETURN count(*) AS n")).n == n


def test_merge_relationship_idempotent(gs):
    for _ in range(2):
        gs.execute("MATCH (a:Person {name: 'Bob'}), (b:Person {name: 'Dave'}) "
                   "MERGE (a)-[:KNOWS]->(b)").collect()
    n = _one(gs.execute(
        "MATCH (:Person {name: 'Bob'})-[r:KNOWS]->(:Person {name: 'Dave'}) "
        "RETURN count(*) AS n")).n
    assert n == 1


def test_delete_connected_node_errors(gs):
    with pytest.raises(CompileError):
        gs.execute("MATCH (p:Person {name: 'Alice'}) DELETE p").collect()


def test_delete_relationship_then_node(gs):
    gs.execute("MATCH (:Person {name: 'Alice'})-[r:KNOWS]->() DELETE r").collect()
    gs.execute("MATCH (p:Person {name: 'Alice'}) DELETE p").collect()
    assert gs.last_summary["nodes_deleted"] == 1
    assert _one(gs.execute(
        "MATCH (p:Person) RETURN count(*) AS n")).n == 3


def test_detach_delete(gs):
    gs.execute("MATCH (p:Person {name: 'Bob'}) DETACH DELETE p").collect()
    s = gs.last_summary
    assert s["nodes_deleted"] == 1 and s["relationships_deleted"] == 1
    assert _one(gs.execute(
        "MATCH ()-[r:KNOWS]->() RETURN count(*) AS n")).n == 0


def test_foreach_creates_per_element(gs):
    gs.execute("FOREACH (i IN [1, 2, 3] | CREATE (:Tick {v: i}))").collect()
    assert gs.last_summary["nodes_created"] == 3
    vals = [r.v for r in gs.execute(
        "MATCH (t:Tick) RETURN t.v AS v ORDER BY v").collect()]
    assert vals == [1, 2, 3]


def test_foreach_set_over_matched(gs):
    gs.execute("MATCH (t:Tick) WITH collect(t.v) AS vs "
               "FOREACH (x IN vs | MERGE (:TickCopy {key: x}))").collect()
    n = _one(gs.execute("MATCH (c:TickCopy) RETURN count(*) AS n")).n
    assert n == 3


def test_call_subquery_write(gs):
    gs.execute("MATCH (t:Tick) CALL { WITH t "
               "CREATE (:TickAudit {v: t.v}) }").collect()
    assert _one(gs.execute(
        "MATCH (a:TickAudit) RETURN count(*) AS n")).n == 3


def test_writes_do_not_leak_into_base_tables(gs):
    # TPC-H labels untouched by the Person/KNOWS churn
    assert _one(gs.execute("MATCH (n:Nation) RETURN count(*) AS n")).n == 25
    assert _one(gs.execute("MATCH (r:Region) RETURN count(*) AS n")).n == 5


def test_merge_mixed_batch_on_match(spark):
    """Mixed match+create MERGE batches: ON MATCH hits only pre-existing
    nodes, ON CREATE only the new ones (operator.cpp:7194 per-row split)."""
    gs = GraphSession(load_tpch_graph(spark, SF_SMOKE))
    gs.execute("CREATE (:Tag {name: 'a'})")
    gs.execute("UNWIND ['a', 'b'] AS nm "
               "MERGE (t:Tag {name: nm}) "
               "ON MATCH SET t.seen = 'yes' "
               "ON CREATE SET t.fresh = 'yes'")
    rows = {r.name: r for r in gs.execute(
        "MATCH (t:Tag) RETURN t.name AS name, t.seen AS seen, "
        "t.fresh AS fresh ORDER BY name").collect()}
    assert rows["a"].seen == "yes" and rows["a"].fresh is None
    assert rows["b"].fresh == "yes" and rows["b"].seen is None
