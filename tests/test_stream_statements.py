"""Stream/trigger statement surface (reference StreamQuery/TriggerQuery
grammar — CREATE/START/STOP/DROP/CHECK STREAM, SHOW STREAMS,
CREATE/DROP TRIGGER, SHOW TRIGGERS)."""

import json
import os
import tempfile
import time

from memgraph_spark.catalog import load_tpch_graph
from memgraph_spark.plans import GraphSession
from memgraph_spark.streaming import register_transformation
from tests.conftest import SF_SMOKE


def test_file_stream_statements(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    gs = GraphSession(g)

    def to_cypher(batch):
        return [("CREATE (:Ingested {name: $n})", {"n": r.name})
                for r in batch.collect()]
    register_transformation("tests.to_cypher", to_cypher)

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "a.json"), "w") as f:
            f.write(json.dumps({"name": "x"}) + "\n")
            f.write(json.dumps({"name": "y"}) + "\n")
        gs.execute(f"CREATE FILE STREAM s1 PATH '{d}' FORMAT json "
                   "TRANSFORM tests.to_cypher")
        rows = gs.execute("SHOW STREAMS").collect()
        assert rows[0].name == "s1" and rows[0].is_running is False
        gs.execute("START STREAM s1 BATCH_LIMIT 1")
        deadline = time.time() + 30
        while time.time() < deadline:
            if "Ingested" in g.nodes and g.nodes["Ingested"].count() == 2:
                break
            time.sleep(0.5)
        assert g.nodes["Ingested"].count() == 2
        chk = gs.execute("CHECK STREAM s1").collect()[0]
        assert chk.batches_run >= 1 and chk.errors == ""
        gs.execute("DROP STREAM s1")
        assert gs.execute("SHOW STREAMS").collect() == []


def test_show_streams_reference_columns(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    gs = GraphSession(g)
    register_transformation("tests.noop", lambda batch: [])
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "a.json"), "w") as f:
            f.write(json.dumps({"name": "x"}) + "\n")
        gs.execute(f"CREATE FILE STREAM cols PATH '{d}' FORMAT json "
                   "TRANSFORM tests.noop BATCH_INTERVAL 250 BATCH_SIZE 10")
        row = {r.name: r for r in gs.execute("SHOW STREAMS").collect()}["cols"]
        # reference header (interpreter.cpp:3246) minus the space in
        # "is running"; batches_run is our operational extra
        assert row.type == "FILE" and row.batch_interval == 250
        assert row.batch_size == 10
        assert row.transformation_name == "tests.noop"
        assert row.owner is None and row.is_running is False
        gs.execute("DROP STREAM cols")


def test_create_stream_any_order_config(spark):
    """Config clauses may appear in any order (grammar: repeated config
    alternatives) — TRANSFORM first, then PATH/FORMAT."""
    g = load_tpch_graph(spark, SF_SMOKE)
    gs = GraphSession(g)
    register_transformation("tests.noop2", lambda batch: [])
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "a.json"), "w") as f:
            f.write(json.dumps({"name": "x"}) + "\n")
        gs.execute(f"CREATE FILE STREAM anyorder TRANSFORM tests.noop2 "
                   f"FORMAT json PATH '{d}'")
        assert any(r.name == "anyorder"
                   for r in gs.execute("SHOW STREAMS").collect())
        gs.execute("DROP STREAM anyorder")


def test_pulsar_stream_statement_gated(spark):
    """CREATE PULSAR STREAM parses the reference grammar (TOPICS +
    SERVICE_URL + common config) and is env-gated exactly like Kafka: with
    no pulsar-spark connector on the classpath it raises the documented
    error and registers nothing."""
    import pytest
    g = load_tpch_graph(spark, SF_SMOKE)
    gs = GraphSession(g)
    register_transformation("tests.pulsar_t", lambda batch: [])
    with pytest.raises(Exception, match="pulsar connector unavailable"):
        gs.execute("CREATE PULSAR STREAM ps1 TOPICS t1,t2 "
                   "TRANSFORM tests.pulsar_t "
                   "SERVICE_URL 'pulsar://localhost:6650' "
                   "BATCH_INTERVAL 150")
    assert all(r.name != "ps1" for r in gs.execute("SHOW STREAMS").collect())
    # unknown transformation is caught before touching the connector
    with pytest.raises(Exception, match="unknown transformation"):
        gs.execute("CREATE PULSAR STREAM ps2 TOPICS t "
                   "TRANSFORM nope.missing")


def test_pulsar_transformation_parity_via_file_source(spark):
    """The Pulsar wire contract (PULSAR_WIRE_SCHEMA) driven through a file
    source: a transformation written against the pulsar columns (`value`
    binary, `__topic`) runs unchanged — the same seam kafka tests use."""
    from memgraph_spark.streaming.streams import PULSAR_WIRE_SCHEMA
    g = load_tpch_graph(spark, SF_SMOKE)
    gs = GraphSession(g)

    def from_pulsar(batch):
        return [("CREATE (:PulsarMsg {payload: $p, topic: $t})",
                 {"p": bytes(r["value"]).decode(), "t": r["__topic"]})
                for r in batch.collect()]
    register_transformation("tests.from_pulsar", from_pulsar)

    with tempfile.TemporaryDirectory() as d:
        rows = [(b"k1", b"hello", "t1", b"m1", None, None),
                (b"k2", b"world", "t1", b"m2", None, None)]
        spark.createDataFrame(rows, PULSAR_WIRE_SCHEMA) \
            .write.mode("overwrite").parquet(d)
        src = spark.readStream.schema(PULSAR_WIRE_SCHEMA).parquet(d)
        reg = g.streams_registry if hasattr(g, "streams_registry") else None
        if reg is None:
            from memgraph_spark.streaming import Streams
            g.streams_registry = reg = Streams(g)
        reg.create("psim", src, from_pulsar, kind="PULSAR",
                   transform_name="tests.from_pulsar")
        gs.execute("START STREAM psim BATCH_LIMIT 1")
        deadline = time.time() + 30
        while time.time() < deadline:
            if "PulsarMsg" in g.nodes and g.nodes["PulsarMsg"].count() == 2:
                break
            time.sleep(0.5)
        got = {(r["payload"], r["topic"])
               for r in g.nodes["PulsarMsg"].select("payload", "topic")
               .collect()}
        assert got == {("hello", "t1"), ("world", "t1")}
        row = {r.name: r for r in
               gs.execute("SHOW STREAMS").collect()}["psim"]
        assert row.type == "PULSAR"
        gs.execute("DROP STREAM psim")


def test_start_stop_all_streams(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    gs = GraphSession(g)
    register_transformation("tests.noop3", lambda batch: [])
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "a.json"), "w") as f:
            f.write(json.dumps({"name": "x"}) + "\n")
        gs.execute(f"CREATE FILE STREAM all1 PATH '{d}' FORMAT json "
                   "TRANSFORM tests.noop3")
        gs.execute(f"CREATE FILE STREAM all2 PATH '{d}' FORMAT json "
                   "TRANSFORM tests.noop3")
        gs.execute("START ALL STREAMS")
        rows = {r.name: r.is_running
                for r in gs.execute("SHOW STREAMS").collect()}
        assert rows["all1"] and rows["all2"]
        gs.execute("STOP ALL STREAMS")
        rows = {r.name: r.is_running
                for r in gs.execute("SHOW STREAMS").collect()}
        assert not rows["all1"] and not rows["all2"]
        gs.execute("DROP STREAM all1")
        gs.execute("DROP STREAM all2")


def test_trigger_statements(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    gs = GraphSession(g)
    gs.execute("CREATE TRIGGER t1 ON CREATE AFTER COMMIT EXECUTE "
               "CREATE (:AuditLog {event: $event_type})")
    rows = gs.execute("SHOW TRIGGERS").collect()
    assert rows[0].trigger_name == "t1" and rows[0].event_type == "CREATE"
    # dispatch happens on the trigger session's write path
    g.trigger_session.execute("CREATE (:Thing {name: 'a'})")
    assert g.nodes["AuditLog"].count() == 1
    assert gs.execute("SHOW TRIGGERS").collect()[0].fired == 1
    gs.execute("DROP TRIGGER t1")
    assert gs.execute("SHOW TRIGGERS").collect() == []


def test_stream_config_quoted_values_with_commas_colons():
    """ADVICE r3: CONFIGS/CREDENTIALS map literals tokenize quote-aware —
    kafka values routinely contain ',' and ':' (bootstrap lists,
    sasl.jaas.config)."""
    from memgraph_spark.admin import _parse_stream_config
    cfg = _parse_stream_config(
        "TOPICS t1 TRANSFORM m.t BOOTSTRAP_SERVERS 'h1:9092,h2:9092' "
        "CONFIGS {'bootstrap.servers': 'a:1,b:2', "
        "'sasl.jaas.config': 'org.kafka.Plain required user=\"u\";', "
        "plain.key: simple} "
        "CREDENTIALS {'password': 'p:w,d'}")
    assert cfg["bootstrap_servers"] == "h1:9092,h2:9092"
    assert cfg["configs"]["bootstrap.servers"] == "a:1,b:2"
    assert cfg["configs"]["sasl.jaas.config"] == \
        'org.kafka.Plain required user="u";'
    assert cfg["configs"]["plain.key"] == "simple"
    assert cfg["credentials"]["password"] == "p:w,d"


def test_arrow_batch_bound_sets_and_restores(spark):
    """ADVICE r3: batch_rows bounds only output slices; the documented
    input-side bound is arrow_batch_bound, which must restore the session
    conf on exit."""
    from memgraph_spark.llm.multimodal import arrow_batch_bound
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key, None)
    with arrow_batch_bound(spark, 7):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key, None) == before
