"""Multi-tenancy + auth statement surface (reference MultiDatabaseQuery /
AuthQuery, src/dbms/, src/auth/ — community parity: store + report)."""

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession


def _session(spark):
    g = PropertyGraph(spark, nodes={"P": spark.createDataFrame(
        [(1,)], "id long")})
    return GraphSession(g)


def test_create_use_drop_database(spark):
    gs = _session(spark)
    gs.execute("CREATE DATABASE tenant_a").collect()
    rows = gs.execute("SHOW DATABASES").collect()
    names = {r["name"]: r["current"] for r in rows}
    assert names.get("tenant_a") is False and names.get("memgraph") is True

    gs.execute("USE DATABASE tenant_a").collect()
    assert gs.execute("SHOW DATABASE").collect()[0]["name"] == "tenant_a"
    # the new tenant is empty; writes land in its own graph
    gs.execute("CREATE (:T {key: 1})").collect()
    assert gs.execute("MATCH (t:T) RETURN count(*) AS n").collect()[0]["n"] == 1

    # dropping the in-use database refuses; switch back first
    with pytest.raises(Exception, match="in use"):
        gs.execute("DROP DATABASE tenant_a")
    gs.execute("USE DATABASE memgraph").collect()
    # the default graph still has its own data, not the tenant's
    assert gs.execute("MATCH (p:P) RETURN count(*) AS n").collect()[0]["n"] == 1
    gs.execute("DROP DATABASE tenant_a").collect()
    assert "tenant_a" not in {
        r["name"] for r in gs.execute("SHOW DATABASES").collect()}
    with pytest.raises(Exception, match="does not exist"):
        gs.execute("USE DATABASE tenant_a")


def test_auth_users_roles_privileges(spark):
    gs = _session(spark)
    gs.execute("CREATE USER alice IDENTIFIED BY 's3cret'").collect()
    gs.execute("CREATE USER bob").collect()
    gs.execute("CREATE ROLE analyst").collect()
    gs.execute("SET ROLE FOR alice TO analyst").collect()
    assert {r["user"] for r in gs.execute("SHOW USERS").collect()} >= \
        {"alice", "bob"}
    assert gs.execute("SHOW ROLE FOR alice").collect()[0]["role"] == "analyst"
    assert [r["users"] for r in
            gs.execute("SHOW USERS FOR analyst").collect()] == ["alice"]

    gs.execute("GRANT MATCH, CREATE TO analyst").collect()
    gs.execute("GRANT AUTH TO alice").collect()
    gs.execute("DENY DELETE TO alice").collect()
    privs = {r["privilege"]: (r["effective"], r["description"])
             for r in gs.execute("SHOW PRIVILEGES FOR alice").collect()}
    assert privs["AUTH"] == ("GRANT", "USER")
    assert privs["DELETE"] == ("DENY", "USER")
    assert privs["MATCH"] == ("GRANT", "ROLE")

    gs.execute("REVOKE AUTH FROM alice").collect()
    privs = {r["privilege"] for r in
             gs.execute("SHOW PRIVILEGES FOR alice").collect()}
    assert "AUTH" not in privs

    with pytest.raises(Exception, match="does not exist"):
        gs.execute("SET ROLE FOR bob TO ghost")
    gs.execute("CLEAR ROLE FOR alice").collect()
    assert gs.execute("SHOW ROLE FOR alice").collect()[0]["role"] == "null"
    gs.execute("DROP USER bob").collect()
    assert "bob" not in {r["user"]
                         for r in gs.execute("SHOW USERS").collect()}


def test_grant_does_not_swallow_cypher(spark):
    gs = _session(spark)
    # a RETURN containing the word GRANT is plain Cypher
    [row] = gs.execute("RETURN 'GRANT MATCH TO x' AS s").collect()
    assert row["s"] == "GRANT MATCH TO x"
