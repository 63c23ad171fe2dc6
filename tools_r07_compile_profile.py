"""Driver-side compile-latency profiler: how long does each declared
query take to BUILD (no action), and how much of that is Env.typeof
probes vs other py4j traffic?  Usage:
    python tools_r07_compile_profile.py [query ...]
Defaults to the compile-bound suspects."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from memgraph_spark.session import get_spark  # noqa: E402
from memgraph_spark import queries as Q  # noqa: E402
from memgraph_spark.plans import exprs  # noqa: E402

PROBE_STATS = {"n": 0, "t": 0.0}
_orig_typeof = exprs.Env.typeof


def typeof_timed(self, col):
    t0 = time.perf_counter()
    out = _orig_typeof(self, col)
    PROBE_STATS["n"] += 1
    PROBE_STATS["t"] += time.perf_counter() - t0
    return out


exprs.Env.typeof = typeof_timed


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or [
        "cy_point_geo", "cy_list_exprs", "cy_collect_reduce",
        "cy_strings", "cy_date_parts", "cy_case_distinct", "cy_params"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session + catalog once so measured builds are hot
    Q.QUERIES["scan_filter_orderby"](spark, sf_dir).count()
    for name in names:
        Q.QUERIES[name](spark, sf_dir)  # warm-up build (catalog caches)
        results = []
        for _ in range(3):
            PROBE_STATS["n"] = 0
            PROBE_STATS["t"] = 0.0
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, sf_dir)
            build = time.perf_counter() - t0
            results.append((build, PROBE_STATS["n"], PROBE_STATS["t"]))
        t0 = time.perf_counter()
        df.count()
        exe = time.perf_counter() - t0
        b, n, pt = min(results, key=lambda r: r[0])
        print(f"{name:>20}: build {b:6.2f}s  ({n:4d} typeof probes "
              f"{pt:6.2f}s = {100 * pt / b if b else 0:4.0f}%)  exec {exe:5.2f}s")


if __name__ == "__main__":
    main()
