"""Bolt server surface (reference: src/communication/bolt/, glue/SessionHL).

`packstream` implements the PackStream v2 value serialization; `bolt`
implements the version handshake, message chunking, and the
HELLO/LOGON/RUN/PULL session state machine over a GraphSession.
"""

from memgraph_spark.server.bolt import BoltServer, serve  # noqa: F401
