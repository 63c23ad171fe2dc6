"""Streaming surface (SURVEY §2.12): stream registry + triggers + TTL."""

from memgraph_spark.streaming.streams import (  # noqa: F401
    Streams,
    StreamSpec,
    TRANSFORMATIONS,
    register_transformation,
)
from memgraph_spark.streaming.triggers import TriggeredSession  # noqa: F401
from memgraph_spark.streaming.ttl import expire  # noqa: F401
