"""Per-job latency split for the iterative headline queries (guide §1).

Runs each query once hot with the Spark event log enabled, then parses the
log: per-job wall time (submit -> end), inter-job driver gaps, and stage
counts. The inter-job gap total is the driver/py4j/AQE-planning latency the
"fewer jobs per round" lever would recover; the in-job total is executor
time the lever cannot touch.

Usage: python tools_r07_joblat.py [query ...]   (default: the 4 loops)
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from memgraph_spark import queries as Q  # noqa: E402

DEFAULT = ["algo_topo_layers", "algo_katz", "bfs_reach", "weighted_shortest"]


def get_spark_with_eventlog(log_dir: str):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("memgraph-spark-joblat")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def parse_events(log_dir: str):
    """Returns the single application's event list."""
    paths = [os.path.join(log_dir, p) for p in os.listdir(log_dir)
             if not p.startswith(".")]
    assert len(paths) == 1, paths
    if os.path.isdir(paths[0]):  # Spark 4 rolling event log directory
        paths = [os.path.join(paths[0], p) for p in os.listdir(paths[0])
                 if p.startswith("events_")]
    events = []
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return events


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="joblat_")
    spark = get_spark_with_eventlog(log_dir)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    for t in Q.graph_for(spark, sf_dir).tables.values():
        t.count()
    for name in names:
        Q.QUERIES[name](spark, sf_dir).count()  # warm-up
    windows = {}
    for name in names:
        sc.setJobDescription(f"joblat:{name}")
        t0 = time.time() * 1000
        tp0 = time.perf_counter()
        Q.QUERIES[name](spark, sf_dir).count()
        wall = time.perf_counter() - tp0
        windows[name] = (t0, time.time() * 1000, wall)
        sc.setJobDescription(None)
    spark.stop()
    events = parse_events(log_dir)

    jobs = {}   # jobId -> {sub, end, desc, stages}
    for ev in events:
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "sub": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "nstages": len(ev.get("Stage IDs", [])),
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    report = {}
    for name in names:
        t0, t1, wall = windows[name]
        js = sorted((j for j in jobs.values()
                     if "end" in j and t0 - 50 <= j["sub"] <= t1 + 50
                     and j["desc"] == f"joblat:{name}"),
                    key=lambda j: j["sub"])
        injob = sum(j["end"] - j["sub"] for j in js) / 1000
        # gaps: from window start to first submit, between jobs, last end to window end
        gaps = []
        cursor = t0
        for j in js:
            gaps.append(max(0.0, j["sub"] - cursor))
            cursor = max(cursor, j["end"])
        gaps.append(max(0.0, t1 - cursor))
        report[name] = {
            "wall_s": round(wall, 3),
            "n_jobs": len(js),
            "in_job_s": round(injob, 3),
            "gap_s": round(sum(gaps) / 1000, 3),
            "per_job_ms": [
                {"dur": j["end"] - j["sub"], "stages": j["nstages"]} for j in js],
            "gaps_ms": [round(g) for g in gaps],
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
