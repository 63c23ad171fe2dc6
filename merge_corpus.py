"""Merge corpus_results.json from the newest full run plus targeted
re-runs (corpus_report.py <pattern> invocations log summary lines but do
not write the json). Each summary line becomes an entry; the full run's
entries carry failure details. Newest source wins per feature file."""

from __future__ import annotations

import json
import re
import sys

LINE = re.compile(
    r"((?:memgraph_V1|openCypher_M09|stackoverflow_answers|unstable)/"
    r"[A-Za-z_0-9]+\.feature): (\d+)/(\d+) pass "
    r"\((\d+) fail, (\d+) error, (\d+) skip, (\d+) timeout\)")


def entries_from_log(path: str) -> dict:
    out = {}
    try:
        text = open(path, errors="replace").read()
    except OSError:
        return out
    for m in LINE.finditer(text):
        name, p, _tot, f, e, s, t = m.groups()
        out[name] = {"pass": int(p), "fail": int(f), "error": int(e),
                     "skip": int(s), "timeout": int(t), "failures": []}
    return out


def main() -> None:
    # oldest -> newest: later sources overwrite earlier ones
    merged: dict = {}
    for path in sys.argv[1:]:
        if path.endswith(".json"):
            try:
                merged.update(json.load(open(path)))
            except Exception as exc:  # noqa: BLE001
                print(f"skip {path}: {exc}")
        else:
            merged.update(entries_from_log(path))
    with open("corpus_results.json", "w") as fh:
        json.dump(dict(sorted(merged.items())), fh, indent=1)
    agg = {k: sum(r[k] for r in merged.values())
           for k in ("pass", "fail", "error", "skip", "timeout")}
    runnable = agg["pass"] + agg["fail"] + agg["error"] + agg["timeout"]
    print(f"{len(merged)} files, {agg['pass']}/{runnable} runnable pass, "
          f"{agg['skip']} skipped")
    sys.path.insert(0, ".")
    from corpus_report import write_md
    write_md(merged, agg, runnable)


if __name__ == "__main__":
    main()
