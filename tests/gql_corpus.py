"""gql_behave corpus runner (SURVEY §5 — the reference's crown-jewel test
layer, tests/gql_behave/run.py + steps/*.py re-expressed for our engine).

Parses the reference's Gherkin `.feature` files (tests/gql_behave/tests/
memgraph_V1 + openCypher_M09) and executes each scenario against a fresh
in-memory PropertyGraph through GraphSession. Result comparison mirrors
steps/parser.py: both the expected table cells and the actual driver values
are canonicalized to the same string form (nodes sorted by label, maps by
key), then compared as an ordered list or an unordered multiset.
"""

from __future__ import annotations

import os
import re
import threading
from dataclasses import dataclass, field

CORPUS_ROOT = "/root/reference/tests/gql_behave/tests"

# steps we recognise but deliberately do not verify (side-effect counters are
# checked by our own write tests; the corpus' tables use server counters)
IGNORED = ("And no side effects", "And the side effects should be")

# steps that make a scenario out-of-scope for this engine (skip, not fail)
UNSUPPORTED_MARKERS = ()


# -- feature parsing ---------------------------------------------------------

@dataclass
class Step:
    kind: str                      # empty|named_graph|exec|query|params|
    #                                expect|expect_empty|expect_error|skip
    text: str = ""
    table: list[list[str]] = field(default_factory=list)
    ordered: bool = False
    list_unordered: bool = False


@dataclass
class Scenario:
    feature: str
    name: str
    steps: list[Step]
    skip_reason: str | None = None
    # Scenario Outline Examples table (header row + value rows); expanded
    # into one concrete scenario per row by parse_feature
    examples: list[list[str]] | None = None


def _split_row(line: str) -> list[str]:
    """Split one `| a | b |` table row, respecting quotes and brackets."""
    body = line.strip()
    assert body.startswith("|") and body.endswith("|")
    body = body[1:-1]
    cells, buf, depth, quote = [], [], 0, None
    skip = False
    for i, ch in enumerate(body):
        if skip:
            skip = False
            continue
        if ch == "\\" and i + 1 < len(body) and body[i + 1] == "|":
            buf.append("|")    # escaped pipe inside a cell
            skip = True
            continue
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        # a '<' only opens a path value when immediately followed by '('
        # (paths print as <(...)...>); '<-' arrows and bare comparison
        # operators like 'count(n) < n.property' are literal text
        elif ch == "<":
            if i + 1 < len(body) and body[i + 1] == "(":
                depth += 1
            buf.append(ch)
        elif ch == ">":
            if depth > 0 and i > 0 and body[i - 1] in ")]":
                depth -= 1
            buf.append(ch)
        elif ch in "([{":
            depth += 1
            buf.append(ch)
        elif ch in ")]}":
            depth -= 1
            buf.append(ch)
        elif ch == "|" and depth == 0:
            cells.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    cells.append("".join(buf).strip())
    return cells


def parse_feature(path: str) -> list[Scenario]:
    lines = open(path).read().splitlines()
    scenarios: list[Scenario] = []
    cur: Scenario | None = None
    background: Scenario | None = None
    i, n = 0, len(lines)

    def docstring(start: int) -> tuple[str, int]:
        j = start
        while j < n and '"""' not in lines[j]:
            j += 1
        body: list[str] = []
        j += 1
        while j < n and '"""' not in lines[j]:
            body.append(lines[j])
            j += 1
        text = "\n".join(body)
        indent = min((len(l) - len(l.lstrip()) for l in body if l.strip()),
                     default=0)
        return "\n".join(l[indent:] for l in body) if indent else text, j + 1

    def table(start: int) -> tuple[list[list[str]], int]:
        rows = []
        j = start
        while j < n and lines[j].strip().startswith("|"):
            rows.append(_split_row(lines[j]))
            j += 1
        return rows, j

    while i < n:
        line = lines[i].strip()
        if line.startswith("Scenario"):
            name = line.split(":", 1)[1].strip() if ":" in line else line
            cur = Scenario(os.path.basename(path), name, [])
            scenarios.append(cur)
            i += 1
            continue
        if line.startswith("Background"):
            # Background steps run before every scenario in the feature
            cur = background = Scenario(os.path.basename(path),
                                        "__background__", [])
            i += 1
            continue
        if cur is None:
            i += 1
            continue
        if any(m in line for m in UNSUPPORTED_MARKERS):
            cur.skip_reason = line
            i += 1
            continue
        if "there exists a procedure" in line:
            # TCK fixture procedure (ProcedureCallAcceptance): signature +
            # a data table mapping input argument values to output rows —
            # registered into the engine's procedure registry per scenario
            rows, i = table(i + 1)
            cur.steps.append(Step("register_proc", line, table=rows))
            continue
        if line in ("Given an empty graph", "Given any graph"):
            cur.steps.append(Step("empty"))
            i += 1
        elif line.startswith('Given graph "'):
            cur.steps.append(Step("named_graph", line.split('"')[1]))
            i += 1
        elif line.startswith("Given the binary-tree-"):
            which = "binary-tree-" + line.split("binary-tree-")[1][0]
            cur.steps.append(Step("named_graph", which))
            i += 1
        elif line.startswith(("And having executed", "Given having executed")):
            text, i = docstring(i + 1)
            cur.steps.append(Step("exec", text))
        elif line.startswith(("When executing query",
                              "When executing control query")):
            text, i = docstring(i + 1)
            cur.steps.append(Step("query", text))
        elif line.startswith(("And parameters are", "Given parameters are")):
            rows, i = table(i + 1)
            cur.steps.append(Step("params", table=rows))
        elif line.startswith("Then the result should be empty"):
            cur.steps.append(Step("expect_empty"))
            i += 1
        elif line.startswith("Then the result should be, in order"):
            rows, i = table(i + 1)
            cur.steps.append(Step("expect", table=rows, ordered=True))
        elif line.startswith("Then the result should be (ignoring element "
                             "order for lists)"):
            rows, i = table(i + 1)
            cur.steps.append(Step("expect", table=rows, list_unordered=True))
        elif line.startswith("Then the result should be"):
            rows, i = table(i + 1)
            cur.steps.append(Step("expect", table=rows))
        elif (" should be raised" in line and line.startswith("Then")):
            cur.steps.append(Step("expect_error", line))
            i += 1
        elif line.startswith(IGNORED):
            if i + 1 < n and lines[i + 1].strip().startswith("|"):
                _, i = table(i + 1)
            else:
                i += 1
        elif "with new vector edge index" in line:
            m = re.match(r".*with new vector edge index (\w+) on :(\w+)"
                         r"\((\w+)\) with dimension (\d+) and capacity"
                         r" (\d+)", line)
            cur.steps.append(Step("exec", (
                f"CREATE VECTOR EDGE INDEX {m.group(1)} ON "
                f":{m.group(2)}({m.group(3)}) WITH CONFIG "
                f'{{"dimension": {m.group(4)}, "capacity": {m.group(5)}}}')))
            i += 1
        elif "with new vector index" in line:
            m = re.match(r".*with new vector index (\w+) on :(\w+)"
                         r"\((\w+)\) with dimension (\d+) and capacity"
                         r" (\d+)", line)
            cur.steps.append(Step("exec", (
                f"CREATE VECTOR INDEX {m.group(1)} ON "
                f":{m.group(2)}({m.group(3)}) WITH CONFIG "
                f'{{"dimension": {m.group(4)}, "capacity": {m.group(5)}}}')))
            i += 1
        elif "with new point index" in line:
            m = re.match(r".*with new point index :(\w+)\((\w+)\)", line)
            cur.steps.append(Step(
                "exec",
                f"CREATE POINT INDEX ON :{m.group(1)}({m.group(2)})"))
            i += 1
        elif "with new edge index :(" in line:
            m = re.match(r".*with new edge index :\((\w+)\)", line)
            cur.steps.append(Step(
                "exec", f"CREATE GLOBAL EDGE INDEX ON :({m.group(1)})"))
            i += 1
        elif "with new text index" in line:
            m = re.match(r".*with new text index (\w+) on :(\w+)"
                         r"(?:\(([^)]*)\))?", line)
            prop = f"({m.group(3)})" if m.group(3) else ""
            cur.steps.append(Step(
                "exec",
                f"CREATE TEXT INDEX {m.group(1)} ON :{m.group(2)}{prop}"))
            i += 1
        elif "with new index :" in line:
            m = re.match(r".*with new index :(\w+)(?:\(([^)]*)\))?", line)
            stmt = f"CREATE INDEX ON :{m.group(1)}" + (
                f"({m.group(2)})" if m.group(2) else "")
            cur.steps.append(Step("exec", stmt))
            i += 1
        elif line.startswith("Examples:"):
            rows, i = table(i + 1)
            if cur.examples is None:
                cur.examples = rows
            else:  # further Examples block: append value rows only
                cur.examples.extend(rows[1:])
        elif line.startswith(("Given", "When", "Then", "And", "But")):
            cur.skip_reason = line  # unknown step -> out of scope
            i += 1
        else:
            i += 1

    if background is not None and background.steps:
        for sc in scenarios:
            sc.steps = list(background.steps) + sc.steps

    # expand Scenario Outlines: one concrete scenario per Examples row, with
    # <placeholder> substitution in query text, tables and names
    def _sub_text(text: str, mapping: dict[str, str]) -> str:
        for k, v in mapping.items():
            text = text.replace(f"<{k}>", v)
        return text

    out: list[Scenario] = []
    for sc in scenarios:
        if not sc.examples or len(sc.examples) < 2:
            out.append(sc)
            continue
        header, *rows = sc.examples
        for ri, row in enumerate(rows):
            mapping = dict(zip(header, row))
            steps = [Step(st.kind, _sub_text(st.text, mapping),
                          [[_sub_text(c, mapping) for c in r]
                           for r in st.table],
                          st.ordered, st.list_unordered)
                     for st in sc.steps]
            out.append(Scenario(sc.feature, f"{sc.name} [{ri + 1}]",
                                steps, sc.skip_reason))
    return out


# -- TCK fixture procedures (ProcedureCallAcceptance) ------------------------

_PROC_SIG = re.compile(
    r"there exists a procedure ([\w.]+)\(([^)]*)\)\s*::\s*"
    r"(VOID|\(([^)]*)\))\s*:?")

_TCK_SPARK_TYPES = {"INTEGER": "long", "FLOAT": "double", "NUMBER": "double",
                    "STRING": "string", "BOOLEAN": "boolean", "ANY": "string"}


def _tck_cell(s: str):
    s = s.strip()
    if s in ("", "null"):
        return None
    if s[:1] in ("'", '"'):
        return s[1:-1]
    if s in ("true", "false"):
        return s == "true"
    if re.fullmatch(r"-?\d+", s):
        return int(s)
    try:
        return float(s)
    except ValueError:
        return s


def _tck_coerce(v, ftype: str, name: str):
    """The TCK's argument coercions: NUMBER takes int/float, FLOAT widens
    int, INTEGER narrows integral floats; bool is never a number."""
    if v is None:
        return None
    if isinstance(v, bool):
        if ftype != "BOOLEAN":
            raise ValueError(f"InvalidArgumentType: {name} expects {ftype}")
        return v
    if ftype == "INTEGER":
        if isinstance(v, int):
            return v
        if isinstance(v, float) and v.is_integer():
            return int(v)
    elif ftype == "FLOAT":
        if isinstance(v, (int, float)):
            return float(v)
    elif ftype == "NUMBER":
        if isinstance(v, (int, float)):
            return v
    elif ftype == "STRING":
        if isinstance(v, str):
            return v
    else:
        return v
    raise ValueError(f"InvalidArgumentType: {name} expects {ftype}, "
                     f"got {type(v).__name__}")


def _tck_fixture(spark, text: str, rows: list[list[str]]):
    """Build (name, fn, signature) for an `there exists a procedure` step:
    the data table maps input argument values to output rows — calling the
    procedure returns the output columns of every row whose input cells
    match the (coerced) arguments, in table order."""
    from pyspark.sql import types as T
    m = _PROC_SIG.search(text)
    name = m.group(1)

    def fields(s):
        out = []
        for part in [p.strip() for p in (s or "").split(",") if p.strip()]:
            fname, ftype = [x.strip() for x in part.split("::")]
            out.append((fname, ftype.rstrip("?").upper()))
        return out

    args = fields(m.group(2))
    outs = [] if m.group(3).upper() == "VOID" else fields(m.group(4))
    header = rows[0] if rows and any(c for c in rows[0]) else []
    data = [[_tck_cell(c) for c in r] for r in rows[1:]]
    idx = {h: k for k, h in enumerate(header)}
    schema = T.StructType([
        T.StructField(on, getattr(T, {
            "long": "LongType", "double": "DoubleType",
            "string": "StringType", "boolean": "BooleanType",
        }[_TCK_SPARK_TYPES.get(ot, "string")])())
        for on, ot in outs])

    def _match(cell, v):
        if isinstance(cell, (int, float)) and isinstance(v, (int, float)) \
                and not isinstance(cell, bool) and not isinstance(v, bool):
            return float(cell) == float(v)
        return cell == v

    def fn(g, *vals):
        if len(vals) != len(args):
            raise ValueError(
                f"InvalidNumberOfArguments: {name} takes {len(args)} "
                f"arguments, got {len(vals)}")
        coerced = [_tck_coerce(v, t, name)
                   for v, (_n, t) in zip(vals, args)]
        out_rows = []
        for r in data:
            if all(_match(r[idx[an]], cv)
                   for (an, _t), cv in zip(args, coerced)):
                out_rows.append(tuple(
                    float(r[idx[on]]) if ot in ("FLOAT", "NUMBER")
                    and r[idx[on]] is not None else r[idx[on]]
                    for on, ot in outs))
        return spark.createDataFrame(out_rows, schema)

    return name, fn, {"args": args, "void": not outs}


# -- value canonicalization --------------------------------------------------

def _canon_float(f: float) -> str:
    import math
    if math.isnan(f):
        return "nan"
    if math.isinf(f):
        return "inf" if f > 0 else "-inf"
    r = round(f, 9)
    if r == int(r) and abs(r) < 1e15:
        return f"{int(r)}.0"
    return repr(r)


def canon_actual(v, list_unordered: bool = False) -> str:
    """Canonical string for a value returned by GraphSession.collect()."""
    import datetime
    lu = list_unordered
    if v is None:
        return "null"
    if isinstance(v, datetime.datetime):  # before date (datetime is a date)
        s = v.strftime("%Y-%m-%dT%H:%M:%S.%f") + "000"
        if v.tzinfo is not None:
            off = v.strftime("%z")
            s += "Z" if off in ("+0000", "") else off[:3] + ":" + off[3:]
        return s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.time):
        return v.strftime("%H:%M:%S.%f") + "000"
    if isinstance(v, datetime.timedelta):
        # memgraph Duration print format: zero units omitted (PT1S, P1DT2H)
        total = v.total_seconds()
        sign = "-" if total < 0 else ""
        total = abs(total)
        d, rem = divmod(total, 86400)
        h, rem = divmod(rem, 3600)
        m, s = divmod(rem, 60)
        out = sign + "P"
        if d:
            out += f"{int(d)}D"
        t = ""
        if h:
            t += f"{int(h)}H"
        if m:
            t += f"{int(m)}M"
        if s or not (d or h or m):
            t += f"{s:.6f}".rstrip("0").rstrip(".") + "S"
        return out + ("T" + t if t else "")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return _canon_float(v)
    if isinstance(v, str):
        # the engine's LocalTime representation is a canonical
        # HH:MM:SS.nnnnnnnnn string — it IS the temporal value, rendered
        # unquoted exactly as the reference prints LocalTime
        if re.fullmatch(r"\d{2}:\d{2}:\d{2}\.\d{9}", v):
            return v
        return f"'{v}'"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)) and not hasattr(v, "asDict"):
        items = [canon_actual(x, lu) for x in v]
        if lu:
            items.sort()
        return "[" + ", ".join(items) + "]"
    if isinstance(v, dict):
        return ("{" + ", ".join(
            f"{k}: {canon_actual(v[k], lu)}" for k in sorted(v)) + "}")
    if hasattr(v, "asDict"):  # Row: node / rel / plain struct
        d = v.asDict(recursive=False)

        def _disp(k: str) -> str:  # reserved props stored as p__<name>
            return k[3:] if k.startswith("p__") else k
        if tuple(d) == ("zdt_epoch", "zdt_nanos", "zdt_off"):
            # ZonedDateTime struct: print local wall time with ±HH:MM
            off = d["zdt_off"]
            t = datetime.datetime.fromtimestamp(
                d["zdt_epoch"] + off, datetime.timezone.utc)
            sign = "+" if off >= 0 else "-"
            return (t.strftime("%Y-%m-%dT%H:%M:%S")
                    + f".{d['zdt_nanos']:09d}"
                    + f"{sign}{abs(off) // 3600:02d}:"
                    + f"{(abs(off) % 3600) // 60:02d}")
        if tuple(d) in (("vb", "vi", "vd", "vs"),
                        ("vb", "vi", "vd", "vs", "va"),
                        ("vb", "vi", "vd", "vs", "va", "vj")):  # variant
            if d.get("vj") is not None:  # nested/mixed list or map as JSON
                import json as _json
                return canon_actual(_json.loads(d["vj"]), lu)
            for slot in ("vb", "vi", "vd", "vs", "va"):
                if slot not in d:
                    continue
                if d[slot] is not None:
                    return canon_actual(d[slot], lu)
            return "null"
        if set(d) <= {"x", "y", "z", "srid"} and "srid" in d \
                and "x" in d:  # spatial point value (point.hpp printing)
            items = {k: x for k, x in d.items() if x is not None}
            if d.get("srid") in (4326, 4979):  # WGS84 prints geo names
                ren = {"x": "longitude", "y": "latitude", "z": "height"}
                items = {ren.get(k, k): x for k, x in items.items()}
            return ("POINT({" + ", ".join(
                f"{k}: {canon_actual(items[k], lu)}"
                for k in sorted(items)) + "})")
        if "nodes" in d and "rels" in d:  # path struct: structural walk
            nodes = d.get("nodes") or []
            rels = d.get("rels") or []
            dirs = d.get("dirs") or []
            out = "<" + canon_actual(nodes[0], lu) if nodes else "<"
            for i, r in enumerate(rels):
                fwd = dirs[i] if i < len(dirs) else True
                seg = canon_actual(r, lu)
                nxt = canon_actual(nodes[i + 1], lu) if i + 1 < len(nodes) \
                    else ""
                out += ("-" + seg + "->" + nxt) if fwd \
                    else ("<-" + seg + "-" + nxt)
            return out + ">"
        # a field-union struct ([n, r, m] lists) carries BOTH shapes —
        # the non-null identity (id vs eid) picks the rendering
        if "labels" in d and "id" in d \
                and ("eid" not in d or d.get("id") is not None):  # node
            labels = sorted(d.get("labels") or [])
            props = {_disp(k): x for k, x in d.items()
                     if k not in ("id", "labels", "eid", "type",
                                  "src", "dst") and x is not None}
            return ("(" + "".join(f":{l}" for l in labels)
                    + (" " if labels and props else "")
                    + (_props_str(props, lu) if props else "") + ")")
        if "eid" in d and "type" in d:  # rel struct
            props = {_disp(k): x for k, x in d.items()
                     if k not in ("id", "labels", "eid", "type",
                                  "src", "dst")
                     and x is not None}
            return ("[:" + d["type"]
                    + (" " + _props_str(props, lu) if props else "") + "]")
        return canon_actual(d, lu)
    return repr(v)


def _quoted_key_map(v, lu: bool) -> str:
    """Map VALUES stored inside node/rel properties print with quoted keys
    (PropertyValue map printing vs TypedValue's bare keys — memgraph.feature
    enum-property scenarios)."""
    if hasattr(v, "asDict"):
        v = v.asDict(recursive=False)
    if not isinstance(v, dict):
        return canon_actual(v, lu)
    return ("{" + ", ".join(
        f"'{k}': {_quoted_key_map(v[k], lu)}" for k in sorted(v)) + "}")


def _props_str(props: dict, lu: bool) -> str:
    def one(v):
        if isinstance(v, dict) or hasattr(v, "asDict"):
            d = v.asDict(recursive=False) if hasattr(v, "asDict") else v
            # graph-value structs (paths/nodes/rels/variants) keep their
            # structural printing; plain map values get quoted keys
            keys = set(d)
            if not ({"id", "labels"} <= keys or {"eid", "type"} <= keys
                    or {"nodes", "rels"} <= keys
                    or (keys <= {"x", "y", "z", "srid"} and "srid" in keys)
                    or tuple(d) in (("vb", "vi", "vd", "vs"),
                                    ("vb", "vi", "vd", "vs", "va"),
                                    ("vb", "vi", "vd", "vs", "va", "vj"))):
                return _quoted_key_map(d, lu)
        return canon_actual(v, lu)
    return ("{" + ", ".join(
        f"{k}: {one(props[k])}" for k in sorted(props)) + "}")


class _P:
    """Recursive-descent parser for TCK expected-value text -> canonical
    string matching canon_actual's output."""

    def __init__(self, s: str, lu: bool):
        self.s = s
        self.i = 0
        self.lu = lu

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def value(self) -> str:
        self.ws()
        if self.s[self.i:self.i + 6].upper() == "POINT(":
            # POINT({x: …, y: …, srid: …}) — canonicalize through the map
            # parser so spacing/key order match canon_actual's rendering
            self.i += 6
            self.ws()
            inner = self.map()
            self.ws()
            assert self.s[self.i] == ")", self.s
            self.i += 1
            return "POINT(" + inner + ")"
        c = self.s[self.i]
        if c == "(":
            return self.node()
        if c == "<":
            return self.path()
        if c == "{":
            return self.map()
        if c == "[":
            save = self.i
            if self._looks_like_rel():
                return self.rel()
            self.i = save
            return self.list()
        if c in "'\"":
            return self.string(c)
        return self.scalar()

    def _looks_like_rel(self) -> bool:
        j = self.i + 1
        while j < len(self.s) and self.s[j] in " \t":
            j += 1
        return j < len(self.s) and self.s[j] == ":"

    def string(self, q: str) -> str:
        self.i += 1
        buf = []
        while True:
            c = self.s[self.i]
            if c == "\\":
                self.i += 1
                nxt = self.s[self.i]
                buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                self.i += 1
                continue
            if c == q:
                # a quote only closes the string when followed by a
                # delimiter or end-of-text; otherwise it's an embedded
                # literal quote ('ai'M'e' is the single value ai'M'e)
                j = self.i + 1
                while j < len(self.s) and self.s[j] in " \t":
                    j += 1
                if j >= len(self.s) or self.s[j] in ",]})|":
                    self.i += 1
                    return "'" + "".join(buf) + "'"
            buf.append(c)
            self.i += 1

    def scalar(self) -> str:
        m = re.match(r"[^,\]\})\|]+", self.s[self.i:])
        tok = m.group(0).strip() if m else ""
        self.i += len(m.group(0)) if m else 0
        low = tok.lower()
        if low == "null":
            return "null"
        if low in ("true", "false"):
            return low
        if re.fullmatch(r"-?\d+", tok):
            return tok
        try:
            return _canon_float(float(tok))
        except ValueError:
            return tok  # bare word (symbol-ish expected value)

    def list(self) -> str:
        self.i += 1  # [
        items = []
        self.ws()
        if self.s[self.i] == "]":
            self.i += 1
            return "[]"
        while True:
            items.append(self.value())
            self.ws()
            if self.s[self.i] == ",":
                self.i += 1
            else:
                break
        assert self.s[self.i] == "]", self.s
        self.i += 1
        if self.lu:
            items.sort()
        return "[" + ", ".join(items) + "]"

    def map(self) -> str:
        self.i += 1  # {
        items = {}
        self.ws()
        if self.s[self.i] == "}":
            self.i += 1
            return "{}"
        while True:
            self.ws()
            m = re.match(r"`([^`]*)`|'([^']*)'|\"([^\"]*)\""
                         r"|([A-Za-z_][A-Za-z0-9_]*)",
                         self.s[self.i:])
            quoted = m.group(2) is not None or m.group(3) is not None
            key = next(g for g in m.groups() if g is not None)
            self.i += m.end()
            self.ws()
            assert self.s[self.i] == ":"
            self.i += 1
            # quoted keys (PropertyValue map printing) keep their quotes
            # so actual/expected canonical forms line up
            items[f"'{key}'" if quoted else key] = self.value()
            self.ws()
            if self.s[self.i] == ",":
                self.i += 1
            else:
                break
        assert self.s[self.i] == "}"
        self.i += 1
        return ("{" + ", ".join(f"{k}: {items[k]}" for k in sorted(items))
                + "}")

    def node(self) -> str:
        self.i += 1  # (
        labels = []
        props = "{}"
        has_props = False
        while True:
            self.ws()
            c = self.s[self.i]
            if c == ":":
                self.i += 1
                m = re.match(r"`([^`]*)`|([A-Za-z_][A-Za-z0-9_]*)",
                             self.s[self.i:])
                labels.append(m.group(1) if m.group(1) is not None
                              else m.group(2))
                self.i += m.end()
            elif c == "{":
                props = self.map()
                has_props = True
            elif c == ")":
                self.i += 1
                break
            else:  # variable name inside node — skip it
                m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", self.s[self.i:])
                self.i += m.end() if m else 1
        labels.sort()
        body = "".join(f":{l}" for l in labels)
        if has_props and props != "{}":
            body += (" " if labels else "") + props
        return "(" + body + ")"

    def rel(self) -> str:
        self.i += 1  # [
        self.ws()
        assert self.s[self.i] == ":"
        self.i += 1
        m = re.match(r"`([^`]*)`|([A-Za-z_][A-Za-z0-9_]*)", self.s[self.i:])
        rtype = m.group(1) if m.group(1) is not None else m.group(2)
        self.i += m.end()
        props = "{}"
        self.ws()
        if self.s[self.i] == "{":
            props = self.map()
            self.ws()
        assert self.s[self.i] == "]"
        self.i += 1
        return "[:" + rtype + (" " + props if props != "{}" else "") + "]"

    def path(self) -> str:
        # keep the structural text with nodes/rels canonicalized
        self.i += 1  # <
        out = "<"
        while self.s[self.i] != ">":
            c = self.s[self.i]
            if c == "(":
                out += self.node()
            elif c == "[":
                out += self.rel()
            elif c in " \t":
                self.i += 1     # whitespace is not structural
            elif c == "-" and self.s[self.i + 1] == ">":
                out += "->"
                self.i += 2
            else:
                out += c
                self.i += 1
        self.i += 1
        return out + ">"


def canon_expected(cell: str, list_unordered: bool = False) -> str:
    cell = cell.strip()
    if not cell:
        return ""
    try:
        return _P(cell, list_unordered).value()
    except Exception:
        # the reference's parser is lenient about corpus typos like
        # "({a:3))" (merge.feature) — a brace closed by a paren; retry
        # with the obvious repair before falling back to raw text
        if cell.endswith("))") and cell.count("{") == cell.count("}") + 1:
            try:
                return _P(cell[:-2] + "})", list_unordered).value()
            except Exception:
                return cell
        return cell


def parse_param_value(cell: str):
    """TCK parameter cell -> Python value (literals only)."""
    cell = cell.strip()
    low = cell.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    if re.fullmatch(r"-?\d+", cell):
        return int(cell)
    try:
        return float(cell)
    except ValueError:
        pass
    if cell.startswith(("'", '"')) and cell.endswith(cell[0]):
        return cell[1:-1]
    if cell.startswith("["):
        import json
        try:
            txt = cell.replace("'", '"')
            txt = re.sub(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)\s*:",
                         r'\1"\2":', txt)
            return json.loads(txt)
        except Exception:
            return cell
    if cell.startswith("{"):
        import json
        try:
            # quote only KEYS (after '{' or ','), never ident-like text
            # inside string values ('Location::Zagreb' must survive)
            txt = cell.replace("'", '"')
            txt = re.sub(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)\s*:",
                         r'\1"\2":', txt)
            return json.loads(txt)
        except Exception:
            return cell
    return cell


# -- runner ------------------------------------------------------------------

class ScenarioResult:
    def __init__(self, status: str, detail: str = ""):
        self.status = status  # pass | fail | error | skip | timeout
        self.detail = detail

    def __repr__(self):
        return f"{self.status}({self.detail})" if self.detail else self.status


def _collect_with_timeout(spark, df, seconds: float):
    out: dict = {}

    def work():
        try:
            out["rows"] = df.collect()
        except Exception as e:  # noqa: BLE001 — surfaced to caller
            out["err"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        spark.sparkContext.cancelAllJobs()
        t.join(10)
        raise TimeoutError(f"collect exceeded {seconds}s")
    if "err" in out:
        raise out["err"]
    return out["rows"]


def _exec_setup(spark, gs, stmt, params, timeout):
    """Execute a setup statement. Typo'd setups in the corpus (stray
    trailing `)`/`,`, e.g. functions.feature "CREATE (b{x: true}))") are
    rejected by the reference parser too — every such scenario expects
    "an error should be raised", so the SyntaxError must propagate."""
    return _collect_with_timeout(
        spark, gs.execute(stmt, params or None), timeout)


# server-level metadata that survives 'Given an empty graph' in the
# reference's one-server-per-suite behave run: user-defined enums
# (memgraph.feature 'Show enums' reads the previous scenario's enum).
# corpus_report resets this per feature file via reset_persistent().
PERSISTENT: dict = {"enums": {}}


def reset_persistent() -> None:
    PERSISTENT["enums"] = {}


def _fresh_graph(spark):
    from memgraph_spark.catalog import PropertyGraph
    g = PropertyGraph(spark)
    if PERSISTENT["enums"]:
        g.enum_registry = {k: list(v)
                           for k, v in PERSISTENT["enums"].items()}
    return g


def run_scenario(spark, sc: Scenario, graphs_dir: str,
                 timeout: float = 60.0) -> ScenarioResult:
    from memgraph_spark.plans.session import GraphSession

    if sc.skip_reason:
        return ScenarioResult("skip", sc.skip_reason)

    gs = GraphSession(_fresh_graph(spark))
    params: dict = {}
    last: dict = {"rows": None, "cols": None, "err": None}
    checked = False

    cell = {"gs": gs}
    try:
        return _run_steps(spark, gs, sc, graphs_dir, timeout, params, last,
                          checked, cell)
    finally:
        reg = getattr(cell["gs"].graph, "enum_registry", None)
        if reg is not None:
            PERSISTENT["enums"] = {k: list(v) for k, v in reg.items()}
        # drop scenario-scoped TCK fixture procedures so a later
        # "unknown procedure" scenario really sees them as unknown
        if cell.get("procs"):
            from memgraph_spark import procedures as _procs
            for pname in cell["procs"]:
                _procs.unregister(pname)


def _run_steps(spark, gs, sc, graphs_dir, timeout, params, last, checked,
               cell):
    from memgraph_spark.plans.session import GraphSession

    for step in sc.steps:
        try:
            if step.kind == "empty":
                from memgraph_spark import admin as _admin
                _admin.reset_global_state()
                old_g = getattr(gs, "graph", None)
                gs = GraphSession(_fresh_graph(spark))
                # the reference's 'Given an empty graph' wipes data, not
                # server metadata: user-defined enums survive (memgraph.
                # feature 'Show enums' uses the previous scenario's enum)
                if old_g is not None and getattr(old_g, "enum_registry",
                                                 None):
                    gs.graph.enum_registry = dict(old_g.enum_registry)
                cell["gs"] = gs
                params = {}
            elif step.kind == "named_graph":
                gs = GraphSession(_fresh_graph(spark))
                cell["gs"] = gs
                path = os.path.join(graphs_dir, step.text + ".cypher")
                text = open(path).read()
                for stmt in [s.strip() for s in text.split(";") if s.strip()]:
                    _collect_with_timeout(spark, gs.execute(stmt), timeout)
            elif step.kind == "register_proc":
                from memgraph_spark import procedures as _procs
                pname, fn, sig = _tck_fixture(spark, step.text, step.table)
                cell.setdefault("procs", []).append(pname)
                _procs.register(pname, fn, signature=sig)
            elif step.kind == "exec":
                for stmt in [s.strip() for s in step.text.split(";")
                             if s.strip()]:
                    try:
                        df = gs.execute(stmt, params or None)
                        rows = _collect_with_timeout(spark, df, timeout)
                        # a Then with no When compares the last executed
                        # statement's result (periodic_commit.feature:
                        # "having executed … Then the result should be")
                        last = {"rows": rows, "cols": df.columns,
                                "err": None}
                    except TimeoutError:
                        raise
                    except Exception as e:  # noqa: BLE001 — sticky setup
                        # the reference's behave runner keeps a failed
                        # setup as the scenario's error state ("Then an
                        # error should be raised" matches it)
                        last = {"rows": None, "cols": None, "err": e}
            elif step.kind == "params":
                for row in step.table:
                    params[row[0].strip().strip("`")] = parse_param_value(
                        row[1])
            elif step.kind == "query":
                prev_err = last["err"]
                last = {"rows": None, "cols": None, "err": None}
                try:
                    df = gs.execute(step.text, params or None)
                    last["cols"] = df.columns
                    last["rows"] = _collect_with_timeout(spark, df, timeout)
                    # a failed setup is sticky for error expectations even
                    # when the query itself succeeds on the empty graph
                    if prev_err is not None and not last["rows"]:
                        last["err"] = prev_err
                except TimeoutError:
                    raise
                except Exception as e:  # noqa: BLE001 — Then decides
                    last["err"] = e
            elif step.kind == "expect_error":
                checked = True
                if last["err"] is None:
                    return ScenarioResult(
                        "fail", "expected an error, query succeeded")
            elif step.kind == "expect_empty":
                checked = True
                if last["err"] is not None:
                    return ScenarioResult("error", repr(last["err"])[:300])
                if last["rows"]:
                    return ScenarioResult(
                        "fail", f"expected empty, got {len(last['rows'])} rows")
            elif step.kind == "expect":
                checked = True
                if last["err"] is not None:
                    return ScenarioResult("error", repr(last["err"])[:300])
                r = _compare(last, step)
                if r is not None:
                    return ScenarioResult("fail", r)
        except TimeoutError as e:
            return ScenarioResult("timeout", str(e))
        except Exception as e:  # noqa: BLE001 — setup failure
            return ScenarioResult("error", repr(e)[:300])
    if not checked:
        # scenario ends after a write/exec with no Then: execution succeeded
        if last["err"] is not None:
            return ScenarioResult("error", repr(last["err"])[:300])
    return ScenarioResult("pass")


def _compare(last: dict, step: Step) -> str | None:
    header, *body = step.table if step.table else ([], )
    exp_cols = [h.strip() for h in header]
    if exp_cols in ([], [""]) and not body:
        # headerless empty table == "the result should be empty"
        if last["rows"]:
            return f"expected empty, got {len(last['rows'])} rows"
        return None
    act_cols = last["cols"] or []
    if not body and len(exp_cols) != len(act_cols):
        # header-only table: emptiness is the real assertion; several corpus
        # features carry a stale header (e.g. vector_edge_search drop)
        if last["rows"]:
            return f"expected empty, got {len(last['rows'])} rows"
        return None
    if sorted(exp_cols) != sorted(act_cols) and body:
        return f"columns {act_cols} != expected {exp_cols}"
    if sorted(exp_cols) != sorted(act_cols):
        if last["rows"]:
            return f"expected empty, got {len(last['rows'])} rows"
        return None
    idx = [act_cols.index(c) for c in exp_cols]
    lu = step.list_unordered
    # the reference's behave harness strips ALL spaces from both sides
    # before comparing (steps/query.py replace(" ", "")) — several feature
    # tables rely on it ('TheMatrix' vs 'The Matrix')
    actual = [tuple(canon_actual(row[j], lu).replace(" ", "") for j in idx)
              for row in (last["rows"] or [])]
    expected = [tuple(canon_expected(c, lu).replace(" ", "") for c in row)
                for row in body]
    if step.ordered:
        if actual != expected:
            return _diff(actual, expected)
    else:
        if sorted(actual) != sorted(expected):
            return _diff(sorted(actual), sorted(expected))
    return None


def _diff(actual, expected) -> str:
    return (f"rows differ\n  actual ({len(actual)}): {actual[:6]}\n"
            f"  expected ({len(expected)}): {expected[:6]}")


def corpus_files(suite: str) -> list[str]:
    d = os.path.join(CORPUS_ROOT, suite, "features")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".feature"))


def graphs_dir_for(suite: str) -> str:
    return os.path.join(CORPUS_ROOT, suite, "graphs")
