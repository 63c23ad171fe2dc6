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
