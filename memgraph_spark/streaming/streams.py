"""Stream registry: CREATE/START/STOP/CHECK STREAM parity (SURVEY §2.12).

Reference: Streams (src/query/stream/streams.hpp:82-183) owns named Kafka/
Pulsar consumers; each batch runs a registered *transformation* producing
(query, parameters) pairs executed against storage (CallCustomTransformation,
src/query/stream/streams.cpp:87-118, result shape checked at :57-72), with
offsets committed after execution (at-least-once).

Spark re-expression: a stream is a Structured Streaming DataFrame;
START = writeStream.foreachBatch(batch -> run transformation -> execute the
generated Cypher through GraphSession). Checkpointing gives the offset-commit
semantics; the single foreachBatch executor serializes graph writes (the
"single committer" required for streaming mutation of shared tables).

Any readStream source works (kafka/file/rate/socket); tests use file sources
with trigger(availableNow=True) since no broker ships in this environment.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession

# transformation: batch DataFrame -> [(cypher, params), ...]
Transformation = Callable[[DataFrame], list[tuple[str, dict]]]


@dataclass
class StreamSpec:
    name: str
    source: DataFrame                 # a readStream DataFrame
    transform: Transformation
    batch_interval_ms: int = 100
    batch_size: int | None = None     # maxOffsetsPerTrigger-style bound
    kind: str = "FILE"                # KAFKA | PULSAR | FILE
    transform_name: str = ""
    owner: str | None = None
    query: object = None              # StreamingQuery handle when running
    batches_run: int = 0
    errors: list = field(default_factory=list)


class Streams:
    """Named-stream manager (Streams::Create/Start/Stop/StartWithLimit/Check,
    src/query/stream/streams.hpp:123-183)."""

    def __init__(self, graph: PropertyGraph):
        self.graph = graph
        self.session = GraphSession(graph)
        self._streams: dict[str, StreamSpec] = {}

    # -- registry ----------------------------------------------------------
    def create(self, name: str, source: DataFrame,
               transform: Transformation,
               batch_interval_ms: int = 100,
               batch_size: int | None = None,
               kind: str = "FILE",
               transform_name: str = "",
               owner: str | None = None) -> StreamSpec:
        if name in self._streams:
            raise ValueError(f"stream {name} already exists")
        spec = StreamSpec(name, source, transform, batch_interval_ms,
                          batch_size, kind.upper(), transform_name, owner)
        self._streams[name] = spec
        return spec

    def drop(self, name: str) -> None:
        self.stop(name)
        self._streams.pop(name, None)

    def names(self) -> list[str]:
        return list(self._streams)

    def show(self) -> list[dict]:
        """SHOW STREAMS parity (interpreter.cpp:3246 header: name, type,
        batch_interval, batch_size, transformation_name, owner, is running;
        batches_run is our operational extra)."""
        return [{
            "name": s.name,
            "type": s.kind,
            "batch_interval": s.batch_interval_ms,
            "batch_size": s.batch_size,
            "transformation_name": s.transform_name,
            "owner": s.owner,
            "is_running": s.query is not None and s.query.isActive,
            "batches_run": s.batches_run,
        } for s in self._streams.values()]

    # -- execution ---------------------------------------------------------
    def _foreach_batch(self, spec: StreamSpec):
        def run(batch_df: DataFrame, batch_id: int) -> None:
            try:
                statements = spec.transform(batch_df)
                for cypher, params in statements:
                    self.session.execute(cypher, params).collect()
                spec.batches_run += 1
            except Exception as exc:  # surfaced via check(); stream keeps going
                spec.errors.append((batch_id, exc))
                raise
        return run

    def start(self, name: str, available_now: bool = False,
              checkpoint_dir: str | None = None):
        """START STREAM. available_now=True drains whatever the source has
        and stops (the test/backfill mode); otherwise micro-batches run at
        the configured interval."""
        spec = self._streams[name]
        writer = spec.source.writeStream.foreachBatch(self._foreach_batch(spec))
        writer = writer.option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix=f"stream-{name}-"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(
                processingTime=f"{spec.batch_interval_ms} milliseconds")
        spec.query = writer.start()
        return spec.query

    def start_with_limit(self, name: str, timeout_s: float = 60.0):
        """StartWithLimit parity: drain the currently-available input, block
        until done, then stop."""
        q = self.start(name, available_now=True)
        q.awaitTermination(timeout_s)
        return q

    def stop(self, name: str) -> None:
        spec = self._streams.get(name)
        if spec and spec.query is not None:
            spec.query.stop()
            spec.query = None

    def check(self, name: str) -> dict:
        """CHECK STREAM: dry-run health info."""
        spec = self._streams[name]
        return {"name": name, "batches_run": spec.batches_run,
                "errors": [str(e) for _, e in spec.errors]}


# -- named transformation registry (the reference's transformation modules:
# -- mgp transformations resolved by "module.name", streams.cpp:87) ---------
TRANSFORMATIONS: dict[str, Transformation] = {}


KAFKA_WIRE_SCHEMA = ("key binary, value binary, topic string, "
                     "partition int, offset long, timestamp timestamp, "
                     "timestampType int")


def kafka_source(spark, bootstrap_servers: str, topic: str,
                 starting_offsets: str = "earliest") -> DataFrame:
    """The Kafka readStream a CREATE KAFKA STREAM maps onto (Streams::Create
    consumer config, src/query/stream/streams.cpp). Requires the
    spark-sql-kafka connector on the classpath and a reachable broker —
    neither ships in this environment, so tests drive the identical
    wire-schema contract (KAFKA_WIRE_SCHEMA) through a file source."""
    return (spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load())


PULSAR_WIRE_SCHEMA = ("__key binary, value binary, __topic string, "
                      "__messageId binary, __publishTime timestamp, "
                      "__eventTime timestamp")


def pulsar_source(spark, service_url: str, topics: str) -> DataFrame:
    """The Pulsar readStream a CREATE PULSAR STREAM maps onto (reference
    src/integrations/pulsar/consumer.hpp; grammar pulsarCreateStream,
    MemgraphCypher.g4:770 — TOPICS + SERVICE_URL). Uses the StreamNative
    pulsar-spark connector's public option names; the connector jar and a
    broker are env-gated exactly like Kafka — tests drive the identical
    wire-schema contract (PULSAR_WIRE_SCHEMA) through a file source."""
    return (spark.readStream.format("pulsar")
            .option("service.url", service_url)
            .option("topics", topics)
            .load())


def register_transformation(name: str, fn: Transformation) -> None:
    """mgp.transformation parity: statements reference transforms by name
    (CREATE ... STREAM ... TRANSFORM module.name)."""
    TRANSFORMATIONS[name.lower()] = fn
