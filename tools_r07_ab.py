"""ABBA-interleaved same-session A/B of AQE parallelismFirst over the
headline suite — eliminates the monotone-load ordering bias an AB-AB
schedule carries. Run in a quiet window (ambient load < 2).

Usage: python tools_r07_ab.py [query ...]   (default: full HEADLINE)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from memgraph_spark import queries as Q  # noqa: E402
from memgraph_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402

CONF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main() -> None:
    names = [n for n in (sys.argv[1:] or HEADLINE) if n in Q.QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r07-ab")
    spark.sparkContext.setLogLevel("FATAL")
    print("ambient load:", os.getloadavg()[0])
    for t in Q.graph_for(spark, sf_dir).tables.values():
        t.count()
    for n in names:
        Q.QUERIES[n](spark, sf_dir).count()
    res = {n: {"true": [], "false": []} for n in names}

    def one(mode: str) -> None:
        spark.conf.set(CONF, mode)
        for n in names:
            t0 = time.perf_counter()
            Q.QUERIES[n](spark, sf_dir).count()
            res[n][mode].append(round(time.perf_counter() - t0, 3))

    for order in ("true", "false", "false", "true", "true", "false"):
        one(order)
    out = {}
    for n in names:
        a = statistics.median(res[n]["true"])
        b = statistics.median(res[n]["false"])
        out[n] = {"parallelismFirst_true": a, "parallelismFirst_false": b,
                  "ratio": round(b / a, 3) if a else None}
        print(f"{n}: true {a:.2f}s  false {b:.2f}s  ratio {b/a:.2f}")
    ta = sum(v["parallelismFirst_true"] for v in out.values())
    tb = sum(v["parallelismFirst_false"] for v in out.values())
    print(f"TOTAL: true {ta:.2f}s  false {tb:.2f}s  ratio {tb/ta:.3f}")
    out["_total"] = {"true": round(ta, 3), "false": round(tb, 3),
                     "load": os.getloadavg()[0]}
    with open("/tmp/ab_r07.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
