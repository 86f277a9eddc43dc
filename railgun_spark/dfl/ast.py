"""DFL AST node types.

Node shapes match the constructs observable in the reference
(railgun/pipeline/Pipeline.go:23-29 builds Literal/Attribute/Function/
BinaryOperator/Pipeline nodes; examples/*.dfl exercise the rest)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Literal(Node):
    value: object  # str | int | float | bool | None


@dataclass(frozen=True)
class Attribute(Node):
    """@a.b.c access path; empty path = whole context (@).
    Null-safe `?.` is the only access mode (Spark struct access is
    null-safe by default, matching go-dfl's `?.`)."""

    path: tuple[str, ...] = ()


@dataclass(frozen=True)
class Variable(Node):
    name: str


@dataclass(frozen=True)
class ArrayNode(Node):
    items: tuple[Node, ...] = ()


@dataclass(frozen=True)
class SetNode(Node):
    items: tuple[Node, ...] = ()


@dataclass(frozen=True)
class DictNode(Node):
    pairs: tuple[tuple[Node, Node], ...] = ()


@dataclass(frozen=True)
class Index(Node):
    base: Node = None
    index: Node = None


@dataclass(frozen=True)
class Unary(Node):
    op: str = ""
    operand: Node = None


@dataclass(frozen=True)
class Binary(Node):
    op: str = ""  # and or == != < <= > >= + - * / % in iin like ilike ?:
    left: Node = None
    right: Node = None


@dataclass(frozen=True)
class Between(Node):
    """x between lo and hi / x within lo and hi (inclusive)."""

    value: Node = None
    lo: Node = None
    hi: Node = None


@dataclass(frozen=True)
class Ternary(Node):
    cond: Node = None
    then: Node = None
    other: Node = None


@dataclass(frozen=True)
class Assign(Node):
    """($name := expr) — binds a pipeline variable, passes context through
    (examples/athena.dfl:9, osm.sh:165)."""

    name: str = ""
    value: Node = None


@dataclass(frozen=True)
class Call(Node):
    name: str = ""
    args: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Pipeline(Node):
    stages: tuple[Node, ...] = ()
