"""Per-query profiler: wall time + Spark job/stage/task counts per headline
query (statusTracker deltas), 2 hot passes after 1 warm-up. Run on a quiet
machine; output is a JSON report for OPTIMIZATION_r07.md.

Usage: python tools_r07_profile.py [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from memgraph_spark import queries as Q  # noqa: E402
from memgraph_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    only = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("memgraph-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    names = [n for n in (only or HEADLINE) if n in Q.QUERIES]
    # warm scans
    for t in Q.graph_for(spark, sf_dir).tables.values():
        t.count()
    for name in names:
        Q.QUERIES[name](spark, sf_dir).count()   # warm-up
    report = {}
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(2):
            jids0 = sc.statusTracker().getJobIdsForGroup(None) or []
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            jids1 = sc.statusTracker().getJobIdsForGroup(None) or []
            new = sorted(set(jids1) - set(jids0))
            n_stages = 0
            n_tasks = 0
            for j in new:
                ji = sc.statusTracker().getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = sc.statusTracker().getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            runs.append({"sec": round(dt, 3), "jobs": len(new),
                         "stages": n_stages, "tasks": n_tasks})
        report[name] = runs
        print(f"[profile] {name}: {runs}")
    with open("/tmp/profile_r07.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
