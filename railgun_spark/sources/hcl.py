"""Minimal HCL (HashiCorp Configuration Language) decoder.

Closes the hcl/hcl2 format slots (reference README.md:16; gss decodes HCL
via the upstream hashicorp parser). This is a from-scratch recursive-
descent parser for the configuration subset railgun actually ferries —
attribute assignments, nested blocks (with labels), strings/numbers/bools/
null, lists, objects, and comments (#, //, /* */). It is not a full HCL2
expression evaluator: by default interpolation `${...}` and function calls
are kept as raw strings, which is the honest schema-on-read behavior for a
config payload headed into a DataFrame row. `loads(text, variables=...)`
opts into evaluating the variable-reference subset of interpolations
(`${name}`, `${var.name}`, dotted paths); function calls and arithmetic
still stay raw.

Grammar (HCL1 and the HCL2 attribute/block subset share this shape):
  body     := (attribute | block)*
  attribute:= IDENT '=' value
  block    := IDENT (STRING | IDENT)* '{' body '}'
  value    := STRING | NUMBER | BOOL | NULL | '[' value,* ']'
            | '{' (IDENT|STRING) ('='|':') value ,* '}' | IDENT
Blocks repeat: `b {..} b {..}` decodes to {"b": [{...}, {...}]}; labeled
blocks nest: `b "x" {..}` -> {"b": {"x": {...}}}.
"""

from __future__ import annotations

import re


class HclError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*|//[^\n]*|/\*.*?\*/)
  | (?P<heredoc><<-?(?P<tag>[A-Za-z_][A-Za-z0-9_]*)\n(?P<body>.*?)\n\s*(?P=tag))
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.-]*)
  | (?P<punct>[={}\[\],:])
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokens(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            raise HclError(f"unexpected character {text[i]!r} at offset {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "heredoc":
            out.append(("string", m.group("body")))
        elif kind == "string":
            out.append(("string", _unquote(m.group("string"))))
        else:
            out.append((kind, m.group(kind)))
    out.append(("eof", ""))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(m.group(1), m.group(1)),
        body,
    )


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise HclError(f"expected {value or kind}, got {v!r}")
        return v

    # body := (attribute | block)*  until `}` or eof
    def body(self, stop: str | None = None) -> dict:
        out: dict = {}
        while True:
            k, v = self.peek()
            if k == "eof" or (stop and k == "punct" and v == stop):
                return out
            if k not in ("ident", "string"):
                raise HclError(f"expected attribute or block name, got {v!r}")
            self.next()
            name = v
            k2, v2 = self.peek()
            if k2 == "punct" and v2 == "=":
                self.next()
                _merge(out, name, self.value())
            else:
                labels = []
                while self.peek()[0] in ("string", "ident") and not (
                    self.peek() == ("punct", "{")
                ):
                    labels.append(self.next()[1])
                self.expect("punct", "{")
                inner = self.body(stop="}")
                self.expect("punct", "}")
                for lab in reversed(labels):
                    inner = {lab: inner}
                _merge(out, name, inner, block=True)

    def value(self):
        k, v = self.next()
        if k == "string":
            return v
        if k == "number":
            return float(v) if any(c in v for c in ".eE") else int(v)
        if k == "ident":
            return {"true": True, "false": False, "null": None}.get(v, v)
        if k == "punct" and v == "[":
            items = []
            while not (self.peek() == ("punct", "]")):
                items.append(self.value())
                if self.peek() == ("punct", ","):
                    self.next()
            self.next()  # ]
            return items
        if k == "punct" and v == "{":
            obj: dict = {}
            while not (self.peek() == ("punct", "}")):
                kk, kv = self.next()
                if kk not in ("ident", "string"):
                    raise HclError(f"bad object key {kv!r}")
                sep_k, sep_v = self.next()
                if not (sep_k == "punct" and sep_v in ("=", ":")):
                    raise HclError(f"expected = or : after object key, got {sep_v!r}")
                obj[kv] = self.value()
                if self.peek() == ("punct", ","):
                    self.next()
            self.next()  # }
            return obj
        raise HclError(f"unexpected value token {v!r}")


def _merge(out: dict, name: str, value, block: bool = False) -> None:
    """Repeated blocks accumulate into a list; labeled blocks deep-merge."""
    if name not in out:
        out[name] = value
        return
    prev = out[name]
    if block and isinstance(prev, dict) and isinstance(value, dict):
        # labeled blocks with distinct labels merge ({"a": {...}} + {"b": {...}})
        if not (set(prev) & set(value)):
            prev.update(value)
            return
    if isinstance(prev, list):
        prev.append(value)
    else:
        out[name] = [prev, value]


def loads(text: str, variables: dict | None = None) -> dict:
    """Parse HCL text into a plain dict (the json-compatible shape the
    upstream hashicorp decoder produces for the same input).

    When ``variables`` is given, HCL2 ``${...}`` interpolations are
    evaluated against it (see `interpolate`); otherwise they stay raw
    strings — the honest schema-on-read behavior for config payloads."""
    p = _Parser(_tokens(text))
    doc = p.body()
    p.expect("eof")
    if variables is not None:
        doc = interpolate(doc, variables)
    return doc


_INTERP = re.compile(r"\$\{([^}]*)\}")
_REF = re.compile(r"^(?:var\.)?([A-Za-z_][A-Za-z0-9_]*)((?:\.[A-Za-z0-9_]+)*)$")


def _resolve_ref(expr: str, variables: dict):
    """Resolve a `${...}` body: a (possibly dotted, optionally var.-prefixed)
    variable reference. Returns (value, True) or (None, False) for anything
    beyond the reference subset (function calls, arithmetic) — those stay
    raw, matching the parser's no-expression-evaluator contract."""
    m = _REF.match(expr.strip())
    if not m:
        return None, False
    cur = variables
    for part in [m.group(1)] + [p for p in m.group(2).split(".") if p]:
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None, False
    return cur, True


def interpolate(value, variables: dict):
    """Evaluate HCL2 ${...} variable interpolations recursively.

    A string that IS a single interpolation keeps the variable's native type
    (`${count}` -> 3); embedded interpolations stringify into the host
    string. Unresolvable or non-reference expressions are left verbatim."""
    if isinstance(value, dict):
        return {k: interpolate(v, variables) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate(v, variables) for v in value]
    if not isinstance(value, str):
        return value
    full = _INTERP.fullmatch(value)
    if full:
        resolved, ok = _resolve_ref(full.group(1), variables)
        return resolved if ok else value

    def _sub(m: re.Match) -> str:
        resolved, ok = _resolve_ref(m.group(1), variables)
        return str(resolved) if ok else m.group(0)

    return _INTERP.sub(_sub, value)


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*$")


def _emit_key(k: str) -> str:
    import json

    return k if _IDENT.match(k) else json.dumps(k)


def _emit_value(v) -> str:
    import json

    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, str):
        return json.dumps(v)
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_emit_value(x) for x in v) + "]"
    if isinstance(v, dict):
        inner = ", ".join(f"{_emit_key(k)} = {_emit_value(x)}" for k, x in v.items())
        return "{ " + inner + " }"
    return json.dumps(str(v))


def dumps(doc: dict) -> str:
    """Serialize a dict to HCL attribute syntax — the write-side twin of
    ``loads`` (round-trips through it; nested dicts emit as object values,
    which decode back to the same shape)."""
    return "\n".join(f"{_emit_key(k)} = {_emit_value(v)}" for k, v in doc.items()) + "\n"
