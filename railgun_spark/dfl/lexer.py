"""DFL tokenizer.

Token inventory fixed by usage in the reference examples:
quotes ('..', ".." , `..`), bare words (examples/bars.dfl:8 `bar`,
osm.sh:137), @attributes with ?. and [] (pipeline/Pipeline.go:7),
$variables, sets/dicts `{}`, arrays `[]`, operators
| and or not in iin like ilike between within == != < <= > >= + - * / %
?: ? : := , ( ) and numeric literals (examples/geonames.dfl, athena.dfl).
Comments: `# ...` to end of line (stripped like config/Dfl.go:50)."""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "and",
    "or",
    "not",
    "in",
    "iin",
    "like",
    "ilike",
    "between",
    "within",
    "true",
    "false",
    "null",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?)
  | (?P<int>\d+)
  | (?P<sq>'(?:[^'\\]|\\.)*')
  | (?P<dq>"(?:[^"\\]|\\.)*")
  | (?P<bq>`(?:[^`\\]|\\.)*`)
  | (?P<attr>@[A-Za-z_][A-Za-z0-9_]*(?:\??\.[A-Za-z_][A-Za-z0-9_]*)*|@)
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\|\||\?:|:=|\+=|-=|==|!=|<=|>=|[|?:,()\[\]{}<>+\-*/%])
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Token:
    kind: str  # num str attr var op word kw eof
    value: object
    pos: int


class DflSyntaxError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    n = len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise DflSyntaxError(f"unexpected character {text[i]!r} at {i}")
        kind = m.lastgroup
        raw = m.group()
        if kind in ("ws", "comment"):
            pass
        elif kind == "float":
            out.append(Token("num", float(raw), i))
        elif kind == "int":
            out.append(Token("num", int(raw), i))
        elif kind in ("sq", "dq", "bq"):
            body = raw[1:-1]
            body = re.sub(r"\\(.)", r"\1", body)
            out.append(Token("str", body, i))
        elif kind == "attr":
            out.append(Token("attr", raw, i))
        elif kind == "var":
            out.append(Token("var", raw[1:], i))
        elif kind == "op":
            out.append(Token("op", raw, i))
        elif kind == "word":
            if raw in KEYWORDS:
                out.append(Token("kw", raw, i))
            else:
                out.append(Token("word", raw, i))
        i = m.end()
    out.append(Token("eof", None, n))
    return out
