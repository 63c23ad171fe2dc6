"""The physical algebra of SURVEY.md §2 as DataFrame combinators.

Each reference operator (src/query/plan/operator.hpp, Volcano pull cursors in
operator.cpp) maps to a function DataFrame -> DataFrame here. The "Frame" of
the reference (one slot per Cypher symbol) is the DataFrame's columns: a bound
node symbol `n` contributes `n_id` plus any fetched `n_<prop>` columns.

Catalyst replaces the reference's rewrite pipeline (SURVEY §4.1): predicate
pushdown, join selection, parallel scan/agg/sort are not re-implemented.
"""

from memgraph_spark.operators.scan import bind, scan_by_id, once  # noqa: F401
from memgraph_spark.operators.expand import (  # noqa: F401
    expand,
    expand_into,
    expand_node_props,
    expand_variable,
    bfs,
    shortest_path,
    weighted_shortest_path,
)
from memgraph_spark.operators.joins import (  # noqa: F401
    cartesian,
    hash_join,
    optional,
    pattern_semi,
    pattern_anti,
)
from memgraph_spark.operators.kshortest import (  # noqa: F401
    bfs_path_counts,
    k_shortest_paths,
    shortest_path_with_nodes,
)
from memgraph_spark.operators.aggregate import aggregate, distinct, unwind  # noqa: F401
from memgraph_spark.operators.sort import order_by, skip, limit  # noqa: F401
from memgraph_spark.operators.setops import union  # noqa: F401
