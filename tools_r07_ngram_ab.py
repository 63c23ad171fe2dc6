"""Same-session interleaved A/B: prefix-filtered vs naive ngram_jaccard
at sf0.1. ABBA x 3 hot passes, medians. Also prints candidate volume."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from memgraph_spark.session import get_spark  # noqa: E402
from memgraph_spark.queries import graph_for  # noqa: E402
from memgraph_spark.llm.dedup import ngram_jaccard_pairs  # noqa: E402
from tools_r07_ngram_check import naive_pairs  # noqa: E402


def t(df):
    t0 = time.perf_counter()
    df.count()
    return time.perf_counter() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    print("ambient load", os.getloadavg())
    docs = graph_for(spark, sf_dir).tables["documents"]
    new = lambda: ngram_jaccard_pairs(docs, n=3, threshold=0.5)  # noqa: E731
    old = lambda: naive_pairs(docs)  # noqa: E731
    # warm both
    t(new()); t(old())
    ns, os_ = [], []
    for i in range(3):
        if i % 2 == 0:
            ns.append(t(new())); os_.append(t(old()))
            os_.append(t(old())); ns.append(t(new()))
        else:
            os_.append(t(old())); ns.append(t(new()))
            ns.append(t(new())); os_.append(t(old()))
    print("new passes", [round(x, 2) for x in ns], "median",
          round(statistics.median(ns), 3))
    print("old passes", [round(x, 2) for x in os_], "median",
          round(statistics.median(os_), 3))
    print("load after", os.getloadavg())


if __name__ == "__main__":
    main()
