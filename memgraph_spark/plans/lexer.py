"""Cypher tokenizer (reference grammar: src/query/frontend/opencypher/
grammar/Cypher.g4; literal stripping in frontend/stripped.cpp)."""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "AS", "ORDER", "BY",
    "SKIP", "LIMIT", "ASC", "ASCENDING", "DESC", "DESCENDING", "DISTINCT",
    "UNWIND", "UNION", "ALL", "CREATE", "MERGE", "DELETE", "DETACH", "SET",
    "REMOVE", "ON", "AND", "OR", "XOR", "NOT", "IN", "STARTS", "ENDS",
    "CONTAINS", "IS", "NULL", "TRUE", "FALSE", "CASE", "WHEN", "THEN",
    "ELSE", "END", "EXISTS", "COUNT", "CALL", "YIELD", "FOREACH",
    "LOAD", "CSV", "PARQUET", "JSONL", "FROM", "HEADER", "NO",
    "DELIMITER", "QUOTE", "NULLIF", "USING", "HOPS",
}

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<float>\d+\.\d+(e[+-]?\d+)?|\d+e[+-]?\d+)
  | (?P<int>0x[0-9a-fA-F]+|\d+)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*|`(?:[^`]|``)*`)
  | (?P<param>\$(?:[A-Za-z_][A-Za-z0-9_]*|\d+|`(?:[^`]|``)*`))
  | (?P<op>::|<>|!=|<=|>=|=~|\.\.|\+=|[-+*/%^=<>(),\[\]{}.:|;])
    """,
    re.VERBOSE | re.DOTALL,
)

ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"', "b": "\b", "f": "\f"}


@dataclass
class Token:
    kind: str   # KEYWORD | NAME | INT | FLOAT | STRING | PARAM | OP | EOF
    value: str | int | float
    pos: int
    raw: str = ""   # original text (keywords keep their case for use as names)


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in ("u", "U"):
                # \uXXXX / \UXXXXXXXX unicode escapes; a malformed one is
                # a SyntaxError (MiscellaneousErrorAcceptance)
                width = 4 if nxt == "u" else 8
                hexpart = s[i + 2:i + 2 + width]
                if len(hexpart) != width or any(
                        ch not in "0123456789abcdefABCDEF"
                        for ch in hexpart):
                    raise SyntaxError(
                        f"invalid unicode literal \\{nxt}{hexpart!r}")
                out.append(chr(int(hexpart, 16)))
                i += 2 + width
                continue
            out.append(ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(text):
        m = TOKEN_RE.match(text, pos)
        if not m:
            raise SyntaxError(f"unexpected character {text[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind == "ws":
            continue
        if kind == "int":
            tokens.append(Token("INT", int(val, 0), m.start()))
        elif kind == "float":
            tokens.append(Token("FLOAT", float(val), m.start()))
        elif kind == "string":
            tokens.append(Token("STRING", _unescape(val[1:-1]), m.start()))
        elif kind == "name":
            if val.startswith("`"):
                tokens.append(Token("NAME", val[1:-1].replace("``", "`"),
                                    m.start()))
            elif val.upper() in KEYWORDS:
                tokens.append(Token("KEYWORD", val.upper(), m.start(), val))
            else:
                tokens.append(Token("NAME", val, m.start()))
        elif kind == "param":
            pv = val[1:]
            if pv.startswith("`"):
                pv = pv[1:-1].replace("``", "`")
            tokens.append(Token("PARAM", pv, m.start()))
        else:
            tokens.append(Token("OP", val, m.start()))
    tokens.append(Token("EOF", "", len(text)))
    return tokens
