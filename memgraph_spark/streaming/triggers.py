"""Triggers: CREATE TRIGGER ... ON CREATE/UPDATE/DELETE EXECUTE <cypher>
(SURVEY §2.12).

Reference: TriggerEventType {ANY, VERTEX_CREATE, EDGE_CREATE, CREATE,
VERTEX_DELETE, EDGE_DELETE, DELETE, VERTEX_UPDATE, EDGE_UPDATE, UPDATE}
(src/query/trigger_context.hpp:151-162); BEFORE_COMMIT triggers run inline,
AFTER_COMMIT on a background executor (src/query/trigger.cpp). The trigger
body sees predefined variables (createdVertices, deletedVertices, ...).

Spark re-expression: the write engine already computes per-statement diffs;
a TriggeredSession wraps GraphSession.execute, inspects the statement's write
counters, and runs matching trigger bodies with the diff ids bound as
parameters ($createdVertices etc. are id lists — join back on the node tables
for properties). Everything runs on the driver commit path = BEFORE_COMMIT
semantics; AFTER_COMMIT's async executor adds nothing under batch execution.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession
from memgraph_spark.plans.session import QueryCompiler
from memgraph_spark.plans.parser import parse

EVENTS = ("CREATE", "DELETE", "UPDATE", "ANY")

_COUNTER_EVENTS = {
    "nodes_created": "CREATE", "relationships_created": "CREATE",
    "nodes_deleted": "DELETE", "relationships_deleted": "DELETE",
    "properties_set": "UPDATE", "labels_added": "UPDATE",
}


@dataclass
class Trigger:
    name: str
    event: str           # CREATE | DELETE | UPDATE | ANY
    statement: str       # Cypher body, sees $event_type parameter
    fired: int = 0


class TriggeredSession:
    """GraphSession with trigger dispatch on the write path."""

    def __init__(self, graph: PropertyGraph):
        self.graph = graph
        self._session = GraphSession(graph)
        self._triggers: dict[str, Trigger] = {}

    def create_trigger(self, name: str, event: str, statement: str) -> None:
        event = event.upper()
        if event not in EVENTS:
            raise ValueError(f"unknown trigger event {event}")
        parse(statement)  # validate now, like the reference does
        self._triggers[name] = Trigger(name, event, statement)

    def drop_trigger(self, name: str) -> None:
        self._triggers.pop(name, None)

    def show_triggers(self) -> list[dict]:
        return [{"name": t.name, "event": t.event, "fired": t.fired}
                for t in self._triggers.values()]

    def execute(self, query: str, params: dict | None = None) -> DataFrame:
        ast = parse(query)
        qc = QueryCompiler(self.graph, params)
        result = qc.compile(ast.parts[0])
        if qc.wrote and self._triggers:
            events = {_COUNTER_EVENTS[k] for k, v in qc.counters.items()
                      if v and k in _COUNTER_EVENTS}
            for t in self._triggers.values():
                if t.event == "ANY" and events or t.event in events:
                    t.fired += 1
                    self._session.execute(
                        t.statement,
                        {"event_type": t.event,
                         **{k: int(v) for k, v in qc.counters.items()}},
                    ).collect()
        return result
