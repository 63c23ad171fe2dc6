"""Dump .explain('formatted') for every declared query to plans/r07/.

Usage: python tools_r07_explain.py [suffix] [query ...]
Writes plans/r07/<name>_<suffix>.txt (default suffix: before).
Iterative algorithms execute driver loops at plan-build time; their file
holds the FINAL returned frame's plan (the per-round shape is documented in
OPTIMIZATION_r07.md).
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from memgraph_spark import queries as Q  # noqa: E402
from memgraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("memgraph-spark-explain")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    names = list(Q.QUERIES)
    if only:
        names = [n for n in names if n in only]
    for name in names:
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            plan = "ERROR building plan:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"[explain] {name} -> {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
