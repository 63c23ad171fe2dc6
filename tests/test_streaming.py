"""Streaming surface tests (SURVEY §2.12): stream transformations via
foreachBatch, trigger dispatch, TTL expiry — modeled on the reference's
tests/e2e/streams + tests/e2e/triggers + tests/e2e/time_to_live suites
(file sources stand in for Kafka; no broker in this environment)."""

from __future__ import annotations

import json
import os
import tempfile
import time

import pytest

from memgraph_spark.catalog import load_tpch_graph
from memgraph_spark.plans import GraphSession
from memgraph_spark.streaming import Streams, TriggeredSession, expire
from tests.conftest import SF_SMOKE


@pytest.fixture()
def graph(spark):
    return load_tpch_graph(spark, SF_SMOKE)


def test_stream_transformation_mutates_graph(spark, graph):
    """File-source stream -> transformation -> generated Cypher executes
    against the graph (the reference's CallCustomTransformation contract)."""
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "batch1.jsonl"), "w") as f:
        for name in ("ada", "grace", "edsger"):
            f.write(json.dumps({"name": name}) + "\n")

    streams = Streams(graph)

    def transform(batch_df):
        rows = batch_df.collect()
        return [("CREATE (:StreamUser {name: $name})", {"name": r["name"]})
                for r in rows]

    source = spark.readStream.schema("name string").json(d)
    streams.create("ingest", source, transform, batch_interval_ms=50)
    streams.start_with_limit("ingest", timeout_s=120)

    gs = GraphSession(graph)
    names = [r.n for r in gs.execute(
        "MATCH (u:StreamUser) RETURN u.name AS n ORDER BY n").collect()]
    assert names == ["ada", "edsger", "grace"]
    info = streams.check("ingest")
    assert info["batches_run"] >= 1 and not info["errors"]
    assert streams.show()[0]["name"] == "ingest"


def test_trigger_fires_on_create(graph):
    ts = TriggeredSession(graph)
    ts.create_trigger(
        "audit", "CREATE",
        "CREATE (:Audit {event: $event_type, n: $nodes_created})")
    ts.execute("CREATE (:Person {name: 'Alice'})").collect()
    ts.execute("CREATE (:Person {name: 'Bob'})").collect()
    audits = ts.execute(
        "MATCH (a:Audit) RETURN a.event AS e, a.n AS n ORDER BY a.key").collect()
    assert len(audits) == 2
    assert all(r.e == "CREATE" and r.n == 1 for r in audits)
    assert ts.show_triggers()[0]["fired"] == 2


def test_trigger_event_filtering(graph):
    ts = TriggeredSession(graph)
    ts.create_trigger("on_del", "DELETE", "CREATE (:DelAudit {marker: 1})")
    ts.execute("CREATE (:Tmp {name: 'x'})").collect()  # CREATE: no fire
    assert ts.show_triggers()[0]["fired"] == 0
    ts.execute("MATCH (t:Tmp) DELETE t").collect()
    assert ts.show_triggers()[0]["fired"] == 1


def test_ttl_expiry(graph):
    gs = GraphSession(graph)
    now_us = int(time.time() * 1_000_000)
    gs.execute("CREATE (:Session {name: 'old', ttl: $t})",
               {"t": now_us - 1000}).collect()
    gs.execute("CREATE (:Session {name: 'live', ttl: $t})",
               {"t": now_us + 10_000_000_000}).collect()
    gs.execute("CREATE (:Session {name: 'forever'})").collect()
    stats = expire(graph, now_epoch_us=now_us)
    assert stats["nodes_deleted"] == 1
    left = sorted(r.n for r in gs.execute(
        "MATCH (s:Session) RETURN s.name AS n").collect())
    assert left == ["forever", "live"]


def test_ttl_cascades_edges(graph):
    gs = GraphSession(graph)
    now_us = int(time.time() * 1_000_000)
    gs.execute("CREATE (:Dev {name: 'a', ttl: $t})-[:WORKS_ON]->"
               "(:Proj {name: 'p'})", {"t": now_us - 1}).collect()
    stats = expire(graph, now_epoch_us=now_us)
    assert stats == {"nodes_deleted": 1, "edges_deleted": 1}
    assert gs.execute("MATCH (:Proj) RETURN count(*) AS n").collect()[0].n == 1
