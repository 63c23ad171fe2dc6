"""ABBA-interleaved checkout A/B: a PINNED head worktree (/root/wt_head —
never the live repo, which may carry mid-session edits) vs the
pre-optimization baseline worktree (/root/wt_base @ the round-6 boundary),
full headline suite, separate subprocess per pass (fresh JVM each time so
neither side inherits the other's warm caches). Run in a quiet window
(ambient load < 2).

Usage: python tools_r07_ab2.py [out.json] [head_tree] [base_tree]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

RUNNER = r"""
import json, os, statistics, sys, time
sys.path.insert(0, sys.argv[1])
from memgraph_spark import queries as Q
from memgraph_spark.session import get_spark
from bench import HEADLINE
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r07-ab2")
spark.sparkContext.setLogLevel("FATAL")
names = [n for n in HEADLINE if n in Q.QUERIES]
for t in Q.graph_for(spark, sf_dir).tables.values():
    t.count()
for n in names:
    Q.QUERIES[n](spark, sf_dir).count()
raw = {n: [] for n in names}
for _ in range(3):
    import gc
    gc.collect(); spark.sparkContext._jvm.System.gc(); time.sleep(1.0)
    for n in names:
        t0 = time.perf_counter()
        Q.QUERIES[n](spark, sf_dir).count()
        raw[n].append(round(time.perf_counter() - t0, 3))
out = {n: round(statistics.median(v), 3) for n, v in raw.items()}
print("ABRESULT " + json.dumps(out))
"""


def one_pass(tree: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, tree], cwd=tree,
        capture_output=True, text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result from {tree}: rc={p.returncode}\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab2_r07.json"
    head = sys.argv[2] if len(sys.argv) > 2 else "/root/wt_head"
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/wt_base"
    res = {"head": [], "base": []}
    print("ambient load:", os.getloadavg()[0])
    for side in ("base", "head", "head", "base"):
        tree = head if side == "head" else base
        r = one_pass(tree)
        res[side].append(r)
        print(f"{side}: total {sum(r.values()):.2f}s  "
              f"load {os.getloadavg()[0]:.2f}")
    names = list(res["head"][0])
    table = {}
    for n in names:
        h = statistics.median([r[n] for r in res["head"]])
        b = statistics.median([r.get(n, float('nan')) for r in res["base"]])
        table[n] = {"base": b, "head": h,
                    "ratio": round(h / b, 3) if b else None}
        print(f"{n:24s} base {b:7.3f}  head {h:7.3f}  {h/b:5.2f}x")
    tb = sum(v["base"] for v in table.values())
    th = sum(v["head"] for v in table.values())
    print(f"TOTAL: base {tb:.2f}s  head {th:.2f}s  ratio {th/tb:.3f}")
    table["_total"] = {"base": round(tb, 3), "head": round(th, 3),
                       "ratio": round(th / tb, 3),
                       "load": os.getloadavg()[0], "raw": res}
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)


if __name__ == "__main__":
    main()
