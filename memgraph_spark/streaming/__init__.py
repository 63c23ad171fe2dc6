"""Streaming surface (SURVEY §2.12): stream registry + triggers + TTL."""

from memgraph_spark.streaming.streams import Streams, StreamSpec  # noqa: F401
from memgraph_spark.streaming.triggers import TriggeredSession  # noqa: F401
from memgraph_spark.streaming.ttl import expire  # noqa: F401
