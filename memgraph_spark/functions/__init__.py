from memgraph_spark.functions.cypher_functions import FUNCTIONS, AGGREGATES  # noqa: F401
