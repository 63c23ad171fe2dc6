"""Same-session A/B bench probe: medians vs a pinned baseline snapshot.

The VM's single-run numbers carry +-50% noise, so cross-day raw
comparisons (BENCH_r(N) vs BENCH_r(N-1)) are meaningless. This probe
removes the VM from the equation:

  python bench_probe.py            # run suite (3x medians), compare against
                                   # BENCH_BASELINE.json, print per-query
                                   # ratios + verdict
  python bench_probe.py --update   # run and (re)write BENCH_BASELINE.json
  SPARK_GRAFT_BENCH_RUNS=5 ...     # more passes for tighter medians

A regression claim is only valid from THIS probe's same-session ratios
(or a same-session checkout A/B), never from two bench.py lines recorded
on different days. Ratio thresholds: >1.25x on the suite median-sum, or
>1.5x on any single query, flags a real slowdown worth bisecting.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import run_suite  # noqa: E402
from memgraph_spark.session import get_spark  # noqa: E402

BASELINE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_BASELINE.json")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("memgraph-spark-bench-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ambient = os.getloadavg()[0]
    if ambient > 2 and "--update" in sys.argv \
            and os.environ.get("SPARK_GRAFT_FORCE_PIN") != "1":
        # re-pinning the baseline in a noisy window poisons every future
        # comparison — refuse (VERDICT r4 item 7); probe-only runs proceed
        # and record the load so adjudication stays mechanical
        print(f"ambient load {ambient:.1f} > 2: refusing to re-pin the "
              "baseline in a noisy window (set SPARK_GRAFT_FORCE_PIN=1 "
              "to override)")
        return
    medians, totals, raw, load_avgs = run_suite(spark, sf_dir, runs)
    total = round(sum(medians.values()), 3)
    print(json.dumps({"medians": medians, "total": total,
                      "per_run_totals": totals,
                      "load_avg": load_avgs}, indent=1))

    if "--update" in sys.argv or not os.path.exists(BASELINE):
        with open(BASELINE, "w") as f:
            json.dump({"sf_dir": sf_dir, "runs": runs, "total": total,
                       "medians": medians, "load_avg": load_avgs}, f,
                      indent=1)
        print(f"baseline written: {BASELINE}")
        return

    base = json.load(open(BASELINE))
    if base.get("sf_dir") != sf_dir:
        print(f"baseline is for {base.get('sf_dir')}, current run is "
              f"{sf_dir} — not comparable; re-pin with --update")
        return
    print(f"\n{'query':24s} {'base':>8s} {'now':>8s} {'ratio':>7s}")
    worst = ("", 0.0)
    for name, now in medians.items():
        b = base["medians"].get(name)
        if b is None:
            print(f"{name:24s} {'new':>8s} {now:8.3f}")
            continue
        ratio = now / b if b else float("inf")
        flag = "  <-- slow" if ratio > 1.5 else ""
        if ratio > worst[1]:
            worst = (name, ratio)
        print(f"{name:24s} {b:8.3f} {now:8.3f} {ratio:6.2f}x{flag}")
    suite_ratio = total / base["total"] if base.get("total") else float("inf")
    verdict = ("REGRESSION" if suite_ratio > 1.25 or worst[1] > 1.5
               else "ok")
    print(f"\nsuite: {base.get('total')}s -> {total}s "
          f"({suite_ratio:.2f}x) — {verdict}"
          + (f"; worst {worst[0]} {worst[1]:.2f}x" if worst[0] else ""))
    print("NOTE: this compares a pinned snapshot from a possibly different "
          "VM day. For a regression CLAIM, re-pin the baseline from the "
          "suspect base commit in THIS session (git worktree + --update) "
          "and re-run.")


if __name__ == "__main__":
    main()
