"""Search surface (SURVEY §2.11): text index + BM25, regex, fuzzy search."""

from memgraph_spark.search.text_index import (  # noqa: F401
    bm25_search,
    build_text_index,
    fuzzy_search,
    regex_search,
    tokenize_text,
)
