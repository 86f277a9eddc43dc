"""Minimal HCL (HashiCorp Configuration Language) decoder.

Closes the hcl/hcl2 format slots (reference README.md:16; gss decodes HCL
via the upstream hashicorp parser). This is a from-scratch recursive-
descent parser for the configuration subset railgun actually ferries —
attribute assignments, nested blocks (with labels), strings/numbers/bools/
null, lists, objects, and comments (#, //, /* */). By default
interpolation `${...}` is kept as raw strings, which is the honest
schema-on-read behavior for a config payload headed into a DataFrame row.
`loads(text, variables=...)` opts into evaluation: variable references
(`${name}`, `${var.name}`, dotted paths, indexing) plus the HCL2
expression subset — arithmetic, comparisons, `&&`/`||`/`!`, ternary, and
a Terraform-stdlib-compatible function set (upper/lower/length/join/
split/format/coalesce/...). Anything unresolvable (unknown function,
missing variable) stays raw rather than corrupting the payload.

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
  | (?P<string>"(?:\\.|\$\{[^}]*\}|[^"\\])*")
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
    """Resolve a `${...}` body. First the fast path: a (possibly dotted,
    optionally var.-prefixed) variable reference. Then the HCL2 expression
    subset (`_eval_expr`): arithmetic, comparisons, &&/||/!, ternary, and
    a function stdlib. Returns (value, True) or (None, False); anything
    unresolvable stays raw — config payloads must never be corrupted by a
    best-effort evaluator."""
    m = _REF.match(expr.strip())
    if m:
        cur = variables
        for part in [m.group(1)] + [p for p in m.group(2).split(".") if p]:
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return None, False
        return cur, True
    try:
        return _eval_expr(expr, variables), True
    except (HclError, ZeroDivisionError, TypeError, ValueError, KeyError, IndexError):
        return None, False


# ---------------------------------------------------------------------------
# HCL2 expression subset evaluator (public-spec semantics: hcl2 expression
# grammar; functions follow the Terraform stdlib signatures for the names
# implemented). Precedence: ternary < || < && < ==/!= < relational < +/- <
# */ /% < unary < postfix index/attr < primary.
# ---------------------------------------------------------------------------
_EXPR_TOKEN = re.compile(
    r"""\s*(?:
    (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:\\.|\$\{[^}]*\}|[^"\\])*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|&&|\|\||[-+*/%!<>?:(),\[\].])
    )""",
    re.VERBOSE,
)

_FUNCS = {
    "upper": lambda s: str(s).upper(),
    "lower": lambda s: str(s).lower(),
    "trimspace": lambda s: str(s).strip(),
    "length": lambda x: len(x),
    "abs": abs,
    "min": min,
    "max": max,
    "ceil": lambda x: int(-(-x // 1)),
    "floor": lambda x: int(x // 1),
    "join": lambda sep, xs: str(sep).join(str(x) for x in xs),
    "split": lambda sep, s: str(s).split(str(sep)),
    "replace": lambda s, a, b: str(s).replace(str(a), str(b)),
    "contains": lambda xs, x: x in xs,
    "coalesce": lambda *xs: next((x for x in xs if x is not None), None),
    "concat": lambda *xs: [e for x in xs for e in x],
    "format": lambda fmt, *xs: _hcl_format(fmt, xs),
    "tostring": lambda x: ("true" if x else "false") if isinstance(x, bool) else str(x),
    "tonumber": lambda x: float(x) if "." in str(x) else int(x),
}


def _hcl_format(fmt, args):
    out, it = [], iter(args)
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec == "%":
                out.append("%")
            elif spec in "sdvfg":
                v = next(it)
                out.append(str(int(v)) if spec == "d" else str(v))
            else:
                raise HclError(f"unsupported format verb %{spec}")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class _ExprParser:
    def __init__(self, text: str, variables: dict):
        self.toks: list[tuple[str, str]] = []
        i = 0
        while i < len(text):
            m = _EXPR_TOKEN.match(text, i)
            if not m or m.end() == i:
                if text[i:].strip():
                    raise HclError(f"bad expression token at {text[i:]!r}")
                break
            i = m.end()
            kind = m.lastgroup
            if kind:
                self.toks.append((kind, m.group(kind)))
        self.toks.append(("eof", ""))
        self.i = 0
        self.vars = variables

    def peek(self):
        return self.toks[self.i]

    def eat(self, op: str | None = None):
        k, v = self.toks[self.i]
        if op is not None and (k != "op" or v != op):
            raise HclError(f"expected {op!r}, got {v!r}")
        self.i += 1
        return v

    def parse(self):
        v = self.ternary()
        if self.peek()[0] != "eof":
            raise HclError(f"trailing tokens at {self.peek()[1]!r}")
        return v

    def ternary(self):
        cond = self.binary(0)
        if self.peek() == ("op", "?"):
            self.eat("?")
            a = self.ternary()
            self.eat(":")
            b = self.ternary()
            return a if cond else b
        return cond

    _LEVELS = [("||",), ("&&",), ("==", "!="), ("<", "<=", ">", ">="),
               ("+", "-"), ("*", "/", "%")]

    def binary(self, lvl: int):
        if lvl == len(self._LEVELS):
            return self.unary()
        left = self.binary(lvl + 1)
        while self.peek()[0] == "op" and self.peek()[1] in self._LEVELS[lvl]:
            op = self.eat()
            right = self.binary(lvl + 1)
            left = _apply_op(op, left, right)
        return left

    def unary(self):
        if self.peek() == ("op", "!"):
            self.eat("!")
            return not self.unary()
        if self.peek() == ("op", "-"):
            self.eat("-")
            return -self.unary()
        return self.postfix()

    def postfix(self):
        v = self.primary()
        while True:
            if self.peek() == ("op", "["):
                self.eat("[")
                idx = self.ternary()
                self.eat("]")
                v = v[idx]
            elif self.peek() == ("op", "."):
                self.eat(".")
                k, name = self.toks[self.i]
                self.i += 1
                if k == "ident":
                    v = v[name]
                elif k == "number" and "." not in name:
                    v = v[int(name)]
                else:
                    raise HclError(f"bad attribute {name!r}")
            else:
                return v

    def primary(self):
        k, v = self.toks[self.i]
        self.i += 1
        if k == "number":
            return float(v) if any(c in v for c in ".eE") else int(v)
        if k == "string":
            return _unquote(v)
        if k == "op" and v == "(":
            inner = self.ternary()
            self.eat(")")
            return inner
        if k == "op" and v == "[":
            items = []
            while self.peek() != ("op", "]"):
                items.append(self.ternary())
                if self.peek() == ("op", ","):
                    self.eat(",")
            self.eat("]")
            return items
        if k == "ident":
            if v in ("true", "false"):
                return v == "true"
            if v == "null":
                return None
            if self.peek() == ("op", "("):  # function call
                self.eat("(")
                args = []
                while self.peek() != ("op", ")"):
                    args.append(self.ternary())
                    if self.peek() == ("op", ","):
                        self.eat(",")
                self.eat(")")
                if v not in _FUNCS:
                    raise HclError(f"unknown function {v!r}")
                return _FUNCS[v](*args)
            if v == "var" and self.peek() == ("op", "."):
                self.eat(".")
                kk, name = self.toks[self.i]
                self.i += 1
                if kk != "ident":
                    raise HclError(f"bad var reference {name!r}")
                return self.vars[name]
            return self.vars[v]
        raise HclError(f"unexpected token {v!r}")


def _apply_op(op: str, a, b):
    if op == "||":
        return bool(a) or bool(b)
    if op == "&&":
        return bool(a) and bool(b)
    if op == "==":
        return a == b
    if op == "!=":
        return a != b
    if op in ("<", "<=", ">", ">="):
        r = {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}
        return r[op]
    if op == "+":
        if isinstance(a, str) or isinstance(b, str):
            raise HclError("HCL has no string +; use format()/join()")
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b
    if op == "%":
        return a % b
    raise HclError(f"unknown operator {op!r}")


def _eval_expr(expr: str, variables: dict):
    return _ExprParser(expr, variables).parse()


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
