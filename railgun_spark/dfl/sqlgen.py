"""DFL -> Spark SQL rendering — twin of `railgun eval`'s SQL output
(railgun/cli/eval.go:121,159 prints node.Sql(...) when --sql is passed).

Renders the same AST the Column compiler consumes into an executable
Spark SQL string: expressions via `expr_sql`, whole pipelines via
`pipeline_sql` (stage composition = nested SELECTs, which Catalyst
collapses — the rendered plan optimizes identically to the Column plan).
Round-trip equivalence (spark.sql(rendered) == compiled Columns) is
asserted in tests/test_dfl.py.

Supported surface mirrors the compiler's batch-mode semantics; constructs
with no SQL equivalent (e.g. struct dropFields merge chains) raise
SqlRenderError rather than rendering something subtly different.
"""

from __future__ import annotations

import re

from railgun_spark.dfl import parser as _parser
from railgun_spark.dfl.ast import (
    ArrayNode,
    Assign,
    Attribute,
    Between,
    Binary,
    Call,
    DictNode,
    Literal,
    Node,
    Pipeline,
    SetNode,
    Ternary,
    Unary,
    Variable,
)


class SqlRenderError(ValueError):
    pass


def _quote_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _ident(name: str) -> str:
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        return name
    return "`" + name.replace("`", "``") + "`"


def _lit_sql(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return _quote_str(str(v))


class _Scope:
    """Rendering scope: column set (for missing-attr -> NULL null-safety,
    mirroring Context.resolve_attr) and $variables (rendered as literals)."""

    def __init__(self, columns: list[str] | None = None, variables: dict | None = None,
                 string_cols: set[str] | None = None):
        self.columns = columns
        self.variables = variables or {}
        self.string_cols = string_cols or set()


def _is_string_node(node: Node, scope: _Scope) -> bool:
    if isinstance(node, Literal):
        return isinstance(node.value, str)
    if isinstance(node, Attribute) and node.path:
        return node.path[0] in scope.string_cols and len(node.path) == 1
    if isinstance(node, Binary) and node.op == "+":
        return _is_string_node(node.left, scope) or _is_string_node(node.right, scope)
    if isinstance(node, Call) and node.name in ("lower", "upper", "concat", "trim", "slugify"):
        return True
    if isinstance(node, Variable):
        return isinstance(scope.variables.get(node.name), str)
    return False


def _is_null_lit(node: Node) -> bool:
    return isinstance(node, Literal) and node.value is None


def expr_sql(node: Node, scope: _Scope) -> str:
    if isinstance(node, Literal):
        return _lit_sql(node.value)
    if isinstance(node, Attribute):
        if not node.path:
            raise SqlRenderError("@ (whole row) has no scalar SQL rendering")
        if scope.columns is not None and node.path[0] not in scope.columns:
            return "NULL"  # schema-on-read null-safety (compiler.resolve_attr)
        return ".".join(_ident(p) for p in node.path)
    if isinstance(node, Variable):
        if node.name not in scope.variables:
            raise SqlRenderError(f"unbound variable ${node.name}")
        v = scope.variables[node.name]
        if isinstance(v, (list, tuple)):
            return "array(" + ", ".join(_lit_sql(x) for x in v) + ")"
        return _lit_sql(v)
    if isinstance(node, ArrayNode):
        return "array(" + ", ".join(expr_sql(i, scope) for i in node.items) + ")"
    if isinstance(node, SetNode):
        return "array_distinct(array(" + ", ".join(expr_sql(i, scope) for i in node.items) + "))"
    if isinstance(node, DictNode):
        parts = []
        for k, v in node.pairs:
            name = str(k.value if isinstance(k, Literal) else k)
            parts.append(f"{expr_sql(v, scope)} AS {_ident(name)}")
        return "struct(" + ", ".join(parts) + ")"
    if isinstance(node, Unary):
        if node.op == "not":
            return f"(NOT {expr_sql(node.operand, scope)})"
        if node.op == "-":
            return f"(- {expr_sql(node.operand, scope)})"
        raise SqlRenderError(f"unary {node.op}")
    if isinstance(node, Between):
        return (
            f"({expr_sql(node.value, scope)} BETWEEN "
            f"{expr_sql(node.lo, scope)} AND {expr_sql(node.hi, scope)})"
        )
    if isinstance(node, Ternary):
        return (
            f"(CASE WHEN {expr_sql(node.cond, scope)} THEN {expr_sql(node.then, scope)} "
            f"ELSE {expr_sql(node.other, scope)} END)"
        )
    if isinstance(node, Binary):
        return _binary_sql(node, scope)
    if isinstance(node, Call):
        return _call_sql(node, scope)
    if isinstance(node, Assign):
        raise SqlRenderError("($x := ...) has no expression-level SQL rendering")
    raise SqlRenderError(f"cannot render {type(node).__name__}")


def _collection_literals(node: Node) -> list | None:
    if isinstance(node, (ArrayNode, SetNode)) and all(isinstance(i, Literal) for i in node.items):
        return [i.value for i in node.items]
    return None


def _structurally_struct(node: Node) -> bool:
    """Structural mirror of the compiler's _maybe_struct for the cases
    decidable without a schema: a dict literal, or a +/- chain rooted in
    one, compiles to struct ops (dropFields), never array ops."""
    if isinstance(node, SetNode):
        return False
    if isinstance(node, DictNode):
        return True
    if isinstance(node, Binary) and node.op in ("+", "-"):
        return _structurally_struct(node.left)
    return False


def _binary_sql(node: Binary, scope: _Scope) -> str:
    op = node.op
    l_node, r_node = node.left, node.right
    if op in ("and", "or"):
        return f"({expr_sql(l_node, scope)} {op.upper()} {expr_sql(r_node, scope)})"
    if op == "?:":
        return f"coalesce({expr_sql(l_node, scope)}, {expr_sql(r_node, scope)})"
    if op in ("==", "!="):
        if _is_null_lit(r_node) or _is_null_lit(l_node):
            target = l_node if _is_null_lit(r_node) else r_node
            verb = "IS NULL" if op == "==" else "IS NOT NULL"
            return f"({expr_sql(target, scope)} {verb})"
    if op in ("==", "!=", "<", "<=", ">", ">="):
        sql_op = {"==": "=", "!=": "!="}.get(op, op)
        return f"({expr_sql(l_node, scope)} {sql_op} {expr_sql(r_node, scope)})"
    if op in ("in", "iin"):
        lits = _collection_literals(r_node)
        lhs = expr_sql(l_node, scope)
        if op == "iin":
            lhs = f"lower({lhs})"
            if lits is not None:
                vals = ", ".join(_lit_sql(str(x).lower()) for x in lits)
                return f"({lhs} IN ({vals}))"
            return f"array_contains(transform({expr_sql(r_node, scope)}, x -> lower(x)), {lhs})"
        if lits is not None:
            return f"({lhs} IN ({', '.join(_lit_sql(x) for x in lits)}))"
        return f"array_contains({expr_sql(r_node, scope)}, {lhs})"
    if op in ("like", "ilike"):
        if not isinstance(r_node, Literal):
            raise SqlRenderError("like pattern must be a literal")
        return f"({expr_sql(l_node, scope)} {op.upper()} {_lit_sql(r_node.value)})"
    if op == "+":
        if isinstance(r_node, DictNode):
            raise SqlRenderError("struct merge (+ dict) has no SQL rendering")
        l, r = expr_sql(l_node, scope), expr_sql(r_node, scope)
        if _is_string_node(l_node, scope) or _is_string_node(r_node, scope):
            return f"concat(CAST({l} AS STRING), CAST({r} AS STRING))"
        return f"({l} + {r})"
    if op == "-":
        if isinstance(r_node, SetNode):
            if _structurally_struct(l_node):
                # the compiler lowers this to struct dropFields (key removal);
                # rendering array_except would be subtly wrong SQL
                raise SqlRenderError(
                    "struct key removal (- {keys}) has no SQL rendering"
                )
            return f"array_except({expr_sql(l_node, scope)}, {expr_sql(r_node, scope)})"
        return f"({expr_sql(l_node, scope)} - {expr_sql(r_node, scope)})"
    if op in ("*", "/", "%"):
        return f"({expr_sql(l_node, scope)} {op} {expr_sql(r_node, scope)})"
    raise SqlRenderError(f"binary op {op}")


_SIMPLE_FNS = {
    "lower": "lower",
    "upper": "upper",
    "trim": "trim",
    "abs": "abs",
    "floor": "floor",
    "ceil": "ceil",
    "sqrt": "sqrt",
    "coalesce": "coalesce",
}


def _call_sql(node: Call, scope: _Scope) -> str:
    name, args = node.name, node.args

    def a(i: int) -> str:
        return expr_sql(args[i], scope)

    if name in _SIMPLE_FNS:
        return f"{_SIMPLE_FNS[name]}({', '.join(expr_sql(x, scope) for x in args)})"
    if name in ("int64", "int32", "int16", "int8"):
        return f"TRY_CAST({a(0)} AS {'BIGINT' if name == 'int64' else 'INT'})"
    if name in ("float64", "float32"):
        return f"TRY_CAST({a(0)} AS {'DOUBLE' if name == 'float64' else 'FLOAT'})"
    if name == "string":
        return f"CAST({a(0)} AS STRING)"
    if name == "concat":
        return "concat(" + ", ".join(f"CAST({expr_sql(x, scope)} AS STRING)" for x in args) + ")"
    if name == "slugify":
        return f"regexp_replace(lower({a(0)}), '[^a-z0-9]+', '-')"
    if name == "len":
        if _is_string_node(args[0], scope):
            return f"length({a(0)})"
        return f"size({a(0)})"
    if name == "split":
        if not isinstance(args[1], Literal):
            raise SqlRenderError("split separator must be a literal")
        return f"split({a(0)}, {_quote_str(re.escape(str(args[1].value)))})"
    if name == "round":
        nd = args[1].value if len(args) > 1 and isinstance(args[1], Literal) else 0
        return f"round({a(0)}, {int(nd)})"
    if name in ("mul", "sub", "add", "div"):
        sym = {"mul": "*", "sub": "-", "add": "+", "div": "/"}[name]
        return f"({a(0)} {sym} {a(1)})"
    if name == "pow":
        return f"power({a(0)}, {a(1)})"
    if name in ("mean", "avg"):
        return f"(aggregate({a(0)}, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE)) / size({a(0)}))"
    if name == "sum":
        return f"aggregate({a(0)}, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE))"
    if name == "max":
        return f"array_max({a(0)})"
    if name == "min":
        return f"array_min({a(0)})"
    if name == "first":
        return f"{a(0)}[0]"
    if name == "last":
        return f"element_at({a(0)}, -1)"
    if name == "set":
        return f"array_distinct({a(0)})"
    if name == "sort":
        return f"array_sort({a(0)})"
    if name == "intersects":
        return f"arrays_overlap({a(0)}, {a(1)})"
    if name == "jaccard":
        da, db = f"array_distinct({a(0)})", f"array_distinct({a(1)})"
        inter = f"size(array_intersect({da}, {db}))"
        union = f"(size({da}) + size({db}) - {inter})"
        return (
            f"(CASE WHEN {union} > 0 THEN {inter} * 1.0 / {union} END)"
        )
    if name == "hamming":
        return f"bit_count(CAST({a(0)} AS BIGINT) ^ CAST({a(1)} AS BIGINT))"
    if name == "lookup":
        if isinstance(args[1], Literal):
            return f"{a(0)}[{_lit_sql(args[1].value)}]"
        return f"{a(0)}[{a(1)}]"
    raise SqlRenderError(f"function {name}() has no SQL rendering")


# --------------------------------------------------------------------------
# Pipeline rendering: each stage wraps the previous SELECT.
# --------------------------------------------------------------------------


def _is_whole(node: Node) -> bool:
    return isinstance(node, Attribute) and node.path == ()


def _sub_expr(arg: Node) -> Node:
    if isinstance(arg, Literal) and isinstance(arg.value, str):
        return _parser.parse(arg.value)
    return arg


def pipeline_sql(
    text: str,
    table: str,
    columns: list[str] | None = None,
    variables: dict | None = None,
    string_cols: set[str] | None = None,
) -> str:
    """Render a batch-mode DFL pipeline to one Spark SQL statement reading
    from `table`. Mirrors run_pipeline's stage semantics."""
    node = _parser.parse(text)
    stages = node.stages if isinstance(node, Pipeline) else (node,)
    scope = _Scope(columns=columns, variables=variables, string_cols=string_cols)
    sql = f"SELECT * FROM {table}"
    for stage in stages:
        sql = _stage_sql(sql, stage, scope)
    return sql


def pipeline_sql_for_df(df, text: str, table: str, variables: dict | None = None) -> str:
    """pipeline_sql with columns/string-typing taken from a DataFrame's
    schema (the compiler's Context.df equivalent)."""
    strings = {c for c, t in df.dtypes if t == "string"}
    return pipeline_sql(
        text, table, columns=list(df.columns), variables=variables, string_cols=strings
    )


def _stage_sql(sql: str, stage: Node, scope: _Scope) -> str:
    if isinstance(stage, Assign):
        from railgun_spark.dfl.compiler import _NO_CONST, _const_eval

        folded = _const_eval(stage.value, scope.variables)
        if folded is not _NO_CONST:
            scope.variables[stage.name] = folded
            return sql
        raise SqlRenderError("only constant-foldable ($x := v) assigns render to SQL")
    if _is_whole(stage):
        return sql
    if isinstance(stage, Call) and stage.args and _is_whole(stage.args[0]):
        name, args = stage.name, stage.args
        if name == "filter":
            pred = expr_sql(_sub_expr(args[1]), scope)
            return f"SELECT * FROM ({sql}) WHERE {pred}"
        if name == "map":
            body = _sub_expr(args[1])
            if isinstance(body, DictNode):
                cols, new_cols, new_strings = [], [], set()
                for k, v in body.pairs:
                    cname = str(k.value if isinstance(k, Literal) else k)
                    cols.append(f"{expr_sql(v, scope)} AS {_ident(cname)}")
                    new_cols.append(cname)
                    # string typing survives the projection: later stages
                    # (len -> length, + -> concat) depend on it
                    if _is_string_node(v, scope):
                        new_strings.add(cname)
                out = f"SELECT {', '.join(cols)} FROM ({sql})"
                # projection changes the visible schema
                scope.columns = new_cols
                scope.string_cols = new_strings
                return out
            out = f"SELECT {expr_sql(body, scope)} AS value FROM ({sql})"
            scope.columns = ["value"]
            scope.string_cols = {"value"} if _is_string_node(body, scope) else set()
            return out
        if name == "sort":
            if len(args) == 1:
                raise SqlRenderError("sort(@) without key needs the full column list")
            key = expr_sql(_sub_expr(args[1]), scope)
            desc = len(args) > 2 and isinstance(args[2], Literal) and args[2].value is True
            return f"SELECT * FROM ({sql}) ORDER BY {key} {'DESC' if desc else 'ASC'}"
        if name == "limit":
            n = args[1].value if len(args) > 1 and isinstance(args[1], Literal) else None
            if n is None:
                raise SqlRenderError("limit(@, n) needs a literal n")
            return sql if n < 0 else f"SELECT * FROM ({sql}) LIMIT {int(n)}"
        if name == "len":
            return f"SELECT count(*) AS value FROM ({sql})"
        if name in ("set", "unique"):
            return f"SELECT DISTINCT * FROM ({sql})"
        if name == "hist":
            if len(args) == 2:
                key = expr_sql(_sub_expr(args[1]), scope)
                return (
                    f"SELECT {key} AS key, count(*) AS count FROM ({sql}) "
                    f"GROUP BY {key} ORDER BY key"
                )
            raise SqlRenderError("hist with a second key has no single-statement rendering")
    raise SqlRenderError(f"stage {stage!r} has no SQL rendering")
