"""TTL: background expiry of vertices by a `ttl` property (SURVEY §2.12).

Reference: src/storage/v2/ttl.hpp:58-80 — a scheduler thread periodically
deletes vertices whose `ttl` (microseconds since epoch) is in the past,
edges included. Spark re-expression: one compaction pass = anti-join every
label table against the expired-id set; incident edges cascade (DETACH
semantics). Run it from any scheduler (Airflow/cron/Structured Streaming
trigger); the pass itself is a pure table-version producer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from memgraph_spark.catalog import PropertyGraph


def expire(graph: PropertyGraph, now_epoch_us: int | None = None,
           ttl_prop: str = "ttl") -> dict[str, int]:
    """One TTL compaction pass; returns {nodes_deleted, edges_deleted}."""
    if now_epoch_us is None:
        import time
        now_epoch_us = int(time.time() * 1_000_000)
    victims = None
    for label, t in graph.nodes.items():
        if ttl_prop not in t.columns:
            continue
        ids = t.filter(F.col(ttl_prop).isNotNull()
                       & (F.col(ttl_prop) <= now_epoch_us)).select("id")
        victims = ids if victims is None else victims.unionByName(ids)
    if victims is None:
        return {"nodes_deleted": 0, "edges_deleted": 0}
    victims = victims.dropDuplicates().localCheckpoint(eager=True)
    n_victims = victims.count()
    if n_victims == 0:
        return {"nodes_deleted": 0, "edges_deleted": 0}
    edges_deleted = 0
    for etype, t in list(graph.edges.items()):
        kept = (t.join(victims.withColumnRenamed("id", "src"),
                       on="src", how="left_anti")
                .join(victims.withColumnRenamed("id", "dst"),
                      on="dst", how="left_anti"))
        edges_deleted += t.count() - kept.count()
        graph.set_edge_version(etype, kept)
    nodes_deleted = 0
    for label, t in list(graph.nodes.items()):
        kept = t.join(victims, on="id", how="left_anti")
        nodes_deleted += t.count() - kept.count()
        graph.set_node_version(label, kept)
    return {"nodes_deleted": nodes_deleted, "edges_deleted": edges_deleted}
