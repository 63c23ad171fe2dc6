"""Kafka stream contract tests.

No broker or spark-sql-kafka connector ships in this environment, so these
tests drive the exact Kafka wire schema (key/value/topic/partition/offset/
timestamp) through a file source and assert the transformation -> Cypher ->
graph-write path behaves identically to a broker-fed stream (reference:
src/query/stream/streams.cpp CallCustomTransformation + offset commit).
The real connector entrypoint is streams.kafka_source — exercised only for
its option contract here.
"""

import json
import os

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.streaming.streams import (
    KAFKA_WIRE_SCHEMA, Streams, kafka_source)


@pytest.fixture()
def graph(spark):
    return PropertyGraph(
        spark,
        nodes={"Seen": spark.createDataFrame([], "id long, uid long, name string")},
        edges={})


def test_kafka_wire_schema_transformation(spark, graph, tmp_path):
    """A stream whose rows carry the Kafka wire schema feeds the same
    transformation contract (batch -> [(cypher, params)]) as a broker."""
    src_dir = tmp_path / "topic"
    src_dir.mkdir()
    rows = [
        {"key": None, "value": json.dumps({"name": f"u{i}"}),
         "topic": "users", "partition": 0, "offset": i,
         "timestamp": "2024-01-01T00:00:00", "timestampType": 0}
        for i in range(5)
    ]
    with open(src_dir / "batch0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream_df = (spark.readStream
                 .schema("key string, value string, topic string, "
                         "partition int, offset long, timestamp string, "
                         "timestampType int")
                 .json(str(src_dir)))

    def transform(batch_df):
        out = []
        for r in batch_df.orderBy("offset").collect():
            payload = json.loads(r["value"])
            out.append((
                "CREATE (:Seen {uid: $off, name: $name})",
                {"off": r["offset"], "name": payload["name"]}))
        return out

    streams = Streams(graph)
    streams.create("users", stream_df, transform)
    q = streams.start("users", available_now=True)
    q.awaitTermination(120)
    streams.stop("users")
    got = {(r.uid, r.name) for r in graph.nodes["Seen"].collect()}
    assert got == {(i, f"u{i}") for i in range(5)}
    info = streams.check("users")
    assert info["batches_run"] >= 1 and not info["errors"]


def test_kafka_source_option_contract(spark):
    """kafka_source builds the documented reader; without the connector on
    the classpath it must fail with the data-source-not-found error, not
    silently misconfigure."""
    try:
        df = kafka_source(spark, "localhost:9092", "users")
    except Exception as exc:  # noqa: BLE001
        msg = str(exc).lower()
        assert "kafka" in msg  # DATA_SOURCE_NOT_FOUND names the source
        return
    # connector present (not this container): the wire schema must match
    assert [f.name for f in df.schema.fields] == [
        c.split()[0] for c in KAFKA_WIRE_SCHEMA.split(", ")]
