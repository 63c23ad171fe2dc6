"""Operational statement surface: storage mode, replication registry,
snapshot durability round-trip, data-directory lock (reference ast.hpp
StorageModeQuery/ReplicationQuery/SnapshotQuery, durability/snapshot.cpp)."""

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession


def _session(spark):
    g = PropertyGraph(
        spark,
        nodes={"P": spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, name string")},
        edges={"R": spark.createDataFrame(
            [(1, 2, 9)], "src long, dst long, eid long")})
    return GraphSession(g)


def test_storage_mode(spark):
    gs = _session(spark)
    gs.execute("STORAGE MODE IN_MEMORY_TRANSACTIONAL").collect()
    info = {r["storage_info"]: r["value"]
            for r in gs.execute("SHOW STORAGE INFO").collect()}
    assert info["storage_mode"] == "IN_MEMORY_TRANSACTIONAL"


def test_replication_registry(spark):
    gs = _session(spark)
    assert gs.execute("SHOW REPLICATION ROLE").collect()[0][
        "replication_role"] == "MAIN"
    gs.execute("REGISTER REPLICA rep1 SYNC TO '10.0.0.5:10000'").collect()
    gs.execute("REGISTER REPLICA rep2 ASYNC TO '10.0.0.6:10000'").collect()
    rows = {r["name"]: (r["sync_mode"], r["socket_address"])
            for r in gs.execute("SHOW REPLICAS").collect()}
    assert rows == {"rep1": ("SYNC", "10.0.0.5:10000"),
                    "rep2": ("ASYNC", "10.0.0.6:10000")}
    gs.execute("DROP REPLICA rep1").collect()
    assert [r["name"] for r in gs.execute("SHOW REPLICAS").collect()] == \
        ["rep2"]
    gs.execute("SET REPLICATION ROLE TO REPLICA WITH PORT 10000").collect()
    assert gs.execute("SHOW REPLICATION ROLE").collect()[0][
        "replication_role"] == "REPLICA"


def test_snapshot_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_DIR", str(tmp_path))
    gs = _session(spark)
    [row] = gs.execute("CREATE SNAPSHOT").collect()
    path = row["path"]
    assert str(tmp_path) in path
    assert path in {r["path"]
                    for r in gs.execute("SHOW SNAPSHOTS").collect()}
    # mutate, then recover: state returns to the snapshot
    gs.execute("MATCH (p:P {name: 'a'}) DETACH DELETE p").collect()
    assert gs.execute("MATCH (p:P) RETURN count(*) AS n").collect()[0][
        "n"] == 1
    gs.execute(f"RECOVER SNAPSHOT '{path}'").collect()
    assert gs.execute("MATCH (p:P) RETURN count(*) AS n").collect()[0][
        "n"] == 2
    assert gs.execute("MATCH (:P)-[r:R]->(:P) RETURN count(*) AS n"
                      ).collect()[0]["n"] == 1


def test_data_directory_lock(spark):
    gs = _session(spark)
    assert gs.execute("DATA DIRECTORY LOCK STATUS").collect()[0][
        "status"] == "unlocked"
    gs.execute("LOCK DATA DIRECTORY").collect()
    assert gs.execute("DATA DIRECTORY LOCK STATUS").collect()[0][
        "status"] == "locked"
    gs.execute("UNLOCK DATA DIRECTORY").collect()
    assert gs.execute("TERMINATE TRANSACTIONS '1'").count() == 0


def test_dump_database_statement(spark):
    gs = _session(spark)
    rows = [r["QUERY"] for r in gs.execute("DUMP DATABASE").collect()]
    assert any("CREATE (" in s for s in rows)
    # statements re-parse through our own frontend into a fresh graph
    from memgraph_spark.catalog import PropertyGraph
    fresh = GraphSession(PropertyGraph(spark))
    for s in rows:
        fresh.execute(s).collect()
    assert fresh.execute("MATCH (p:P) RETURN count(*) AS n").collect()[0][
        "n"] == 2
