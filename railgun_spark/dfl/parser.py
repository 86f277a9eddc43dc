"""DFL recursive-descent / Pratt parser.

Grammar (precedence low -> high), fixed by the usage surface cited in
SURVEY §2.2 and the examples in /root/reference/railgun/examples:

    pipeline   := assign ('|' assign)*
    assign     := '(' '$'name ':=' ternary ')' | ternary
    ternary    := or_ ('?' pipeline ':' pipeline | '?:' or_)*
    or_        := and_ ('or' and_)*
    and_       := not_ ('and' not_)*
    not_       := 'not' not_ | comparison
    comparison := additive (cmp_op additive
                           | ('between'|'within') additive 'and' additive)?
    additive   := multiplicative (('+'|'-') multiplicative)*
    multiplicative := unary (('*'|'/'|'%') unary)*
    unary      := '-' unary | postfix
    postfix    := primary ('[' pipeline ']')*
    primary    := literal | '@path' | '$var' | word '(' args ')' | word
                | '(' pipeline ')' | '[' items ']' | '{' set_or_dict '}'

Bare words parse as string literals (examples/bars.dfl:8 `bar`,
osm.sh:66 `[clinic, doctors, hospital]`) unless followed by '(' (call).
"""

from __future__ import annotations

from railgun_spark.dfl.ast import (
    ArrayNode,
    Assign,
    Attribute,
    Between,
    Binary,
    Call,
    DictNode,
    Index,
    Literal,
    Node,
    Pipeline,
    SetNode,
    Ternary,
    Unary,
    Variable,
)
from railgun_spark.dfl.lexer import DflSyntaxError, Token, tokenize

_CMP_OPS = {"==", "!=", "<", "<=", ">", ">="}


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value=None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise DflSyntaxError(f"expected {value or kind}, got {t.value!r} at {t.pos}")
        return t

    def at_op(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.value in vals

    def at_kw(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.value in vals

    # ---- grammar ----
    def pipeline(self) -> Node:
        stages = [self.assign()]
        while self.at_op("|"):
            self.next()
            stages.append(self.assign())
        return stages[0] if len(stages) == 1 else Pipeline(tuple(stages))

    def assign(self) -> Node:
        # '(' $name ':=' expr ')' — lookahead for the := form
        if self.at_op("(") and self.toks[self.i + 1].kind == "var":
            j = self.i + 2
            if j < len(self.toks) and self.toks[j].kind == "op" and self.toks[j].value == ":=":
                self.next()  # (
                name = self.next().value
                self.next()  # :=
                value = self.ternary()
                self.expect("op", ")")
                return Assign(name, value)
        return self.ternary()

    def ternary(self) -> Node:
        node = self.or_()
        while True:
            if self.at_op("?:"):
                self.next()
                node = Binary("?:", node, self.or_())
            elif self.at_op("?"):
                self.next()
                then = self.pipeline()
                self.expect("op", ":")
                other = self.pipeline()
                node = Ternary(node, then, other)
            else:
                return node

    def or_(self) -> Node:
        node = self.and_()
        while self.at_kw("or"):
            self.next()
            node = Binary("or", node, self.and_())
        return node

    def and_(self) -> Node:
        node = self.not_()
        while self.at_kw("and"):
            self.next()
            node = Binary("and", node, self.not_())
        return node

    def not_(self) -> Node:
        if self.at_kw("not"):
            self.next()
            return Unary("not", self.not_())
        return self.comparison()

    def comparison(self) -> Node:
        node = self.additive()
        t = self.peek()
        if t.kind == "op" and t.value in _CMP_OPS:
            self.next()
            return Binary(t.value, node, self.additive())
        if self.at_kw("like", "ilike"):
            op = self.next().value
            return Binary(op, node, self._like_pattern())
        if self.at_kw("in", "iin"):
            op = self.next().value
            return Binary(op, node, self.additive())
        if self.at_kw("between", "within"):
            self.next()
            lo = self.additive()
            self.expect("kw", "and")
            hi = self.additive()
            return Between(node, lo, hi)
        return node

    def _like_pattern(self) -> Node:
        """like/ilike pattern: quoted string, or the bare `%taco%` form
        (examples/mexican.dfl:8) — a run of %, words and numbers."""
        t = self.peek()
        if t.kind == "str":
            return Literal(self.next().value)
        parts: list[str] = []
        while True:
            t = self.peek()
            if t.kind == "op" and t.value == "%":
                parts.append("%")
                self.next()
            elif t.kind in ("word", "num"):
                parts.append(str(self.next().value))
            else:
                break
        if not parts:
            raise DflSyntaxError(f"expected like pattern at {t.pos}")
        return Literal("".join(parts))

    def additive(self) -> Node:
        node = self.multiplicative()
        while self.at_op("+", "-", "+=", "-="):
            op = self.next().value
            rhs = self.multiplicative()
            # += / -= are the in-place spellings of + / - on dicts/sets
            # (examples/athena.dfl:12-16, pipeline/Pipeline.go:11)
            node = Binary(op.rstrip("="), node, rhs)
        return node

    def multiplicative(self) -> Node:
        node = self.unary()
        while self.at_op("*", "/", "%"):
            op = self.next().value
            node = Binary(op, node, self.unary())
        return node

    def unary(self) -> Node:
        if self.at_op("-"):
            self.next()
            return Unary("-", self.unary())
        return self.postfix()

    def postfix(self) -> Node:
        node = self.primary()
        while self.at_op("["):
            self.next()
            idx = self.pipeline()
            self.expect("op", "]")
            node = Index(node, idx)
        return node

    def primary(self) -> Node:
        t = self.next()
        if t.kind == "num":
            return Literal(t.value)
        if t.kind == "str":
            return Literal(t.value)
        if t.kind == "attr":
            raw = t.value
            if raw == "@":
                return Attribute(())
            path = tuple(p for p in raw[1:].replace("?.", ".").split("."))
            return Attribute(path)
        if t.kind == "var":
            return Variable(t.value)
        if t.kind == "kw":
            if t.value == "true":
                return Literal(True)
            if t.value == "false":
                return Literal(False)
            if t.value == "null":
                return Literal(None)
            raise DflSyntaxError(f"unexpected keyword {t.value!r} at {t.pos}")
        if t.kind == "word":
            if self.at_op("("):
                self.next()
                args: list[Node] = []
                if not self.at_op(")"):
                    args.append(self.pipeline())
                    while self.at_op(","):
                        self.next()
                        args.append(self.pipeline())
                self.expect("op", ")")
                return Call(t.value, tuple(args))
            return Literal(t.value)  # bare word -> string
        if t.kind == "op" and t.value == "(":
            node = self.pipeline()
            self.expect("op", ")")
            return node
        if t.kind == "op" and t.value == "[":
            items: list[Node] = []
            if not self.at_op("]"):
                items.append(self.pipeline())
                while self.at_op(","):
                    self.next()
                    items.append(self.pipeline())
            self.expect("op", "]")
            return ArrayNode(tuple(items))
        if t.kind == "op" and t.value == "{":
            return self._set_or_dict()
        raise DflSyntaxError(f"unexpected token {t.value!r} at {t.pos}")

    def _set_or_dict(self) -> Node:
        if self.at_op("}"):
            self.next()
            return SetNode(())
        first = self.ternary()
        if self.at_op(":"):
            self.next()
            pairs = [(first, self.ternary())]
            while self.at_op(","):
                self.next()
                k = self.ternary()
                self.expect("op", ":")
                pairs.append((k, self.ternary()))
            self.expect("op", "}")
            return DictNode(tuple(pairs))
        items = [first]
        while self.at_op(","):
            self.next()
            items.append(self.ternary())
        self.expect("op", "}")
        return SetNode(tuple(items))


def parse(text: str) -> Node:
    p = _Parser(tokenize(text))
    node = p.pipeline()
    p.expect("eof")
    return node
