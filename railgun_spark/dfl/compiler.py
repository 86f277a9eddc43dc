"""DFL -> Catalyst compiler.

Two compilation levels, mirroring how the reference evaluates (SURVEY §3.1):

1. **Expression level** (`compile_expr`): a DFL expression against a row
   context becomes a pyspark Column — pure Catalyst, no Python in the data
   path. The reference interprets the same AST per object
   (railgun/cli/process.go:918); we emit it once and let Tungsten run it.

2. **Pipeline level** (`run_pipeline`): `|`-separated stages where `@` is
   the whole collection become DataFrame transformations
   (filter/map/sort/limit/set/hist/group...). Stages with scalar results
   (len/bbox/mean) return driver values, matching the reference's batch
   mode where a stage may collapse the collection to a scalar
   (examples/osm.sh:106-137).

Stream-mode per-object processing (`process`): expression evaluated per
row; a null result drops the row (railgun/cli/process.go:184-189 — the
dfl.Null convention); a dict result becomes the new row shape.

Schema-aware operator dispatch: `+` is numeric add, string concat
(examples/geonames.sh:49), or right-biased dict merge
(examples/athena.dfl:4) depending on operand types; `-` is numeric sub,
key-removal (geonames.dfl:20) or set difference (hostosm.sh:40)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from railgun_spark.dfl import parser as _parser
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


class DflCompileError(ValueError):
    pass


@dataclass
class Context:
    """Row-level compilation context.

    df: the DataFrame whose columns @attributes resolve against.
    variables: $name bindings — python literals or per-row Columns
      (the reference threads vars through evaluation the same way,
      railgun/cli/process.go:114-127).
    """

    df: DataFrame | None = None
    variables: dict[str, Any] = field(default_factory=dict)

    def whole_row(self) -> Column:
        if self.df is None:
            raise DflCompileError("@ used outside a row context")
        return F.struct(*[F.col(c) for c in self.df.columns])

    def resolve_attr(self, path: tuple[str, ...]) -> Column:
        if not path:
            return self.whole_row()
        if self.df is not None and path[0] not in self.df.columns:
            # attribute missing from the schema: null (schema-on-read
            # null-safety — go-dfl `?.` semantics)
            return F.lit(None)
        col = F.col(path[0])
        for p in path[1:]:
            col = col.getField(p) if False else col[p]
        return col


def _lit(v) -> Column:
    return F.lit(v)


def _is_string_node(node: Node, ctx: Context) -> bool:
    if isinstance(node, Literal):
        return isinstance(node.value, str)
    if isinstance(node, Attribute) and ctx.df is not None and node.path:
        return _dtype_of(node, ctx) == "string"
    if isinstance(node, Binary) and node.op == "+":
        return _is_string_node(node.left, ctx) or _is_string_node(node.right, ctx)
    if isinstance(node, Call) and node.name in ("lower", "upper", "concat", "trim", "slugify"):
        return True
    if isinstance(node, Variable):
        return isinstance(ctx.variables.get(node.name), str)
    return False


def _dtype_of(node: Node, ctx: Context) -> str | None:
    """Best-effort dtype lookup for a top-level column attribute."""
    if not (isinstance(node, Attribute) and node.path and ctx.df is not None):
        return None
    dt = dict(ctx.df.dtypes).get(node.path[0])
    if dt is None or len(node.path) == 1:
        return dt
    return None  # nested: unknown without walking the struct type


def _struct_node(node: Node) -> bool:
    return isinstance(node, DictNode)


def compile_expr(node: Node, ctx: Context) -> Column:
    """DFL expression -> Column (row context)."""
    if isinstance(node, Literal):
        return _lit(node.value)
    if isinstance(node, Attribute):
        return ctx.resolve_attr(node.path)
    if isinstance(node, Variable):
        # sentinel lookup: a variable legitimately bound to null must compile
        # to lit(None), not masquerade as unbound
        v = ctx.variables.get(node.name, _NO_CONST)
        if v is _NO_CONST:
            raise DflCompileError(f"unbound variable ${node.name}")
        return v if isinstance(v, Column) else _lit_value(v)
    if isinstance(node, ArrayNode):
        return F.array(*[compile_expr(i, ctx) for i in node.items])
    if isinstance(node, SetNode):
        return F.array_distinct(F.array(*[compile_expr(i, ctx) for i in node.items]))
    if isinstance(node, DictNode):
        fields = []
        for k, v in node.pairs:
            name = k.value if isinstance(k, Literal) else str(k)
            fields.append(compile_expr(v, ctx).alias(str(name)))
        return F.struct(*fields)
    if isinstance(node, Index):
        base = compile_expr(node.base, ctx)
        if isinstance(node.index, Literal):
            return base.getItem(node.index.value)
        return base.getItem(compile_expr(node.index, ctx))
    if isinstance(node, Unary):
        if node.op == "not":
            return ~compile_expr(node.operand, ctx)
        if node.op == "-":
            return -compile_expr(node.operand, ctx)
        raise DflCompileError(f"unary {node.op}")
    if isinstance(node, Between):
        v = compile_expr(node.value, ctx)
        return v.between(compile_expr(node.lo, ctx), compile_expr(node.hi, ctx))
    if isinstance(node, Ternary):
        cond = compile_expr(node.cond, ctx)
        return F.when(cond, compile_expr(node.then, ctx)).otherwise(
            compile_expr(node.other, ctx)
        )
    if isinstance(node, Binary):
        return _compile_binary(node, ctx)
    if isinstance(node, Call):
        return _compile_call(node, ctx)
    if isinstance(node, Assign):
        # expression-level assign: bind and pass the value through
        col = compile_expr(node.value, ctx)
        ctx.variables[node.name] = col
        return col
    raise DflCompileError(f"cannot compile {type(node).__name__} as expression")


def _lit_value(v) -> Column:
    if isinstance(v, (list, tuple, set)):
        return F.array(*[F.lit(x) for x in sorted(v)]) if isinstance(v, set) else F.array(
            *[F.lit(x) for x in v]
        )
    return F.lit(v)


def _collection_literals(node: Node) -> list | None:
    if isinstance(node, (ArrayNode, SetNode)) and all(
        isinstance(i, Literal) for i in node.items
    ):
        return [i.value for i in node.items]
    return None


def _compile_binary(node: Binary, ctx: Context) -> Column:
    op = node.op
    if op == "and":
        return compile_expr(node.left, ctx) & compile_expr(node.right, ctx)
    if op == "or":
        return compile_expr(node.left, ctx) | compile_expr(node.right, ctx)
    if op == "?:":
        return F.coalesce(compile_expr(node.left, ctx), compile_expr(node.right, ctx))
    if op in ("==", "!="):
        # comparisons against the null literal mean IS [NOT] NULL in DFL
        # (examples/bars.dfl:8 `@properties?.amenity != null`)
        if _is_null_lit(node.right) or _is_null_lit(node.left):
            target = node.left if _is_null_lit(node.right) else node.right
            c = compile_expr(target, ctx)
            return c.isNull() if op == "==" else c.isNotNull()
    if op in ("==", "!=", "<", "<=", ">", ">="):
        l, r = compile_expr(node.left, ctx), compile_expr(node.right, ctx)
        return {
            "==": l == r,
            "!=": l != r,
            "<": l < r,
            "<=": l <= r,
            ">": l > r,
            ">=": l >= r,
        }[op]
    if op in ("in", "iin"):
        lits = _collection_literals(node.right)
        l = compile_expr(node.left, ctx)
        if op == "iin":
            l = F.lower(l)
            if lits is not None:
                return l.isin([str(x).lower() for x in lits])
            return F.array_contains(
                F.transform(compile_expr(node.right, ctx), F.lower), l
            )
        if lits is not None:
            return l.isin(lits)
        return F.array_contains(compile_expr(node.right, ctx), l)
    if op in ("like", "ilike"):
        l = compile_expr(node.left, ctx)
        pat = node.right.value if isinstance(node.right, Literal) else None
        if pat is None:
            raise DflCompileError("like pattern must be a literal")
        return l.ilike(pat) if op == "ilike" else l.like(pat)
    if op == "+":
        if _struct_node(node.right):
            # right-biased dict merge: @properties + {k: v, ...}
            base = compile_expr(node.left, ctx)
            for k, v in node.right.pairs:
                name = k.value if isinstance(k, Literal) else str(k)
                base = base.withField(str(name), compile_expr(v, ctx))
            return base
        l, r = compile_expr(node.left, ctx), compile_expr(node.right, ctx)
        if _is_string_node(node.left, ctx) or _is_string_node(node.right, ctx):
            return F.concat(l.cast("string"), r.cast("string"))
        return l + r
    if op == "-":
        if isinstance(node.right, SetNode):
            keys = _collection_literals(node.right)
            if keys is not None and _maybe_struct(node.left, ctx):
                # key removal from a dict: (...) - {longitude, latitude}
                return compile_expr(node.left, ctx).dropFields(*[str(k) for k in keys])
            # set difference on arrays
            return F.array_except(
                compile_expr(node.left, ctx), compile_expr(node.right, ctx)
            )
        l, r = compile_expr(node.left, ctx), compile_expr(node.right, ctx)
        if isinstance(node.right, Variable) and isinstance(
            ctx.variables.get(node.right.name), (list, set, tuple)
        ):
            return F.array_except(l, r)
        return l - r
    if op == "*":
        return compile_expr(node.left, ctx) * compile_expr(node.right, ctx)
    if op == "/":
        return compile_expr(node.left, ctx) / compile_expr(node.right, ctx)
    if op == "%":
        return compile_expr(node.left, ctx) % compile_expr(node.right, ctx)
    raise DflCompileError(f"binary op {op}")


def _is_null_lit(node: Node) -> bool:
    return isinstance(node, Literal) and node.value is None


def _maybe_struct(node: Node, ctx: Context) -> bool:
    if isinstance(node, (DictNode, Binary)) and not isinstance(node, SetNode):
        if isinstance(node, Binary):
            return node.op in ("+", "-") and _maybe_struct(node.left, ctx)
        return True
    if isinstance(node, Attribute) and node.path and ctx.df is not None:
        dt = dict(ctx.df.dtypes).get(node.path[0], "")
        return dt.startswith("struct") if len(node.path) == 1 else True
    return False


def _sub_expr(arg: Node) -> Node:
    """filter/map/hist/group/sort second args are quoted DFL strings
    (examples/bars.dfl:8-12); parse them to ASTs."""
    if isinstance(arg, Literal) and isinstance(arg.value, str):
        return _parser.parse(arg.value)
    return arg


# ---- scalar function registry (the af.Functions twin; SURVEY §2.8) ----

def _fn_mean_array(arr: Column) -> Column:
    total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return total / F.size(arr)


def _compile_call(node: Call, ctx: Context) -> Column:
    name = node.name
    args = node.args

    def a(i):
        return compile_expr(args[i], ctx)

    if name in ("int64", "int32", "int16", "int8"):
        # lenient cast: malformed input -> null (schema-on-read semantics;
        # the reference's per-object conversion never fails a whole batch)
        return a(0).try_cast("long" if name == "int64" else "int")
    if name in ("float64", "float32"):
        return a(0).try_cast("double" if name == "float64" else "float")
    if name == "string":
        return a(0).cast("string")
    if name == "coalesce":
        return F.coalesce(*[compile_expr(x, ctx) for x in args])
    if name == "lower":
        return F.lower(a(0))
    if name == "upper":
        return F.upper(a(0))
    if name == "trim":
        return F.trim(a(0))
    if name == "split":
        sep = args[1].value if isinstance(args[1], Literal) else None
        if sep is None:
            raise DflCompileError("split separator must be a literal")
        import re as _re

        return F.split(a(0), _re.escape(str(sep)))
    if name == "concat":
        return F.concat(*[compile_expr(x, ctx).cast("string") for x in args])
    if name == "slugify":
        # railgun/Slugify.go:14-20: lowercase, non-alnum runs -> '-'
        return F.regexp_replace(F.lower(a(0)), "[^a-z0-9]+", "-")
    if name == "len":
        c = a(0)
        # len of string -> length; len of array -> size. Choose by node type.
        if _is_string_node(args[0], ctx):
            return F.length(c)
        return F.size(c)
    if name in ("mul",):
        return a(0) * a(1)
    if name in ("sub",):
        return a(0) - a(1)
    if name in ("add",):
        return a(0) + a(1)
    if name in ("div",):
        return a(0) / a(1)
    if name == "pow":
        return F.pow(a(0), a(1))
    if name == "abs":
        return F.abs(a(0))
    if name == "round":
        return F.round(a(0), args[1].value if len(args) > 1 else 0)
    if name == "floor":
        return F.floor(a(0))
    if name == "ceil":
        return F.ceil(a(0))
    if name == "sqrt":
        return F.sqrt(a(0))
    if name == "mean" or name == "avg":
        return _fn_mean_array(a(0))
    if name == "sum":
        return F.aggregate(a(0), F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    if name == "max":
        return F.array_max(a(0))
    if name == "min":
        return F.array_min(a(0))
    if name == "first":
        return a(0).getItem(0)
    if name == "last":
        return F.element_at(a(0), -1)
    if name == "set":
        return F.array_distinct(a(0))
    if name == "array":
        return a(0)
    if name == "sort":
        return F.array_sort(a(0))
    if name == "lookup":
        return a(0).getItem(compile_expr(args[1], ctx)) if not isinstance(
            args[1], Literal
        ) else a(0).getItem(args[1].value)
    if name == "intersects":
        return F.arrays_overlap(a(0), a(1))
    if name == "jaccard":
        # exact set similarity |A n B| / |A u B| over DISTINCT views of
        # both arrays (same semantics as the dedup operators); empty-vs-
        # empty is NULL (guarded — ANSI mode would raise on 0/0)
        da, db = F.array_distinct(a(0)), F.array_distinct(a(1))
        inter = F.size(F.array_intersect(da, db))
        union = F.size(da) + F.size(db) - inter
        return F.when(union > 0, inter * F.lit(1.0) / union)
    if name == "hamming":
        # bit distance between integer fingerprints (the simhash verify
        # expression as a scalar)
        return F.bit_count(a(0).cast("long").bitwiseXOR(a(1).cast("long")))
    if name == "tileX" or name == "tilex":
        from railgun_spark.geo.tiles import tile_x

        return tile_x(a(0).cast("double"), a(1))
    if name == "tileY" or name == "tiley":
        from railgun_spark.geo.tiles import tile_y

        return tile_y(a(0).cast("double"), a(1))
    if name == "geohash":
        from railgun_spark.geo.tiles import GEOHASH_PRECISION, geohash

        # precision fixes the bit plan at compile time, so it must be a
        # literal (like split's separator)
        if len(args) > 2 and not isinstance(args[2], Literal):
            raise DflCompileError("geohash precision must be a literal")
        prec = int(args[2].value) if len(args) > 2 else GEOHASH_PRECISION
        return geohash(a(0).cast("double"), a(1).cast("double"), prec)
    if name == "filter":
        # array-level filter: filter(@arr, 'pred with @ = element')
        pred = _sub_expr(args[1])
        return F.filter(a(0), lambda el: compile_expr(pred, _element_ctx(ctx, el)))
    if name == "map":
        fn = _sub_expr(args[1])
        return F.transform(a(0), lambda el: compile_expr(fn, _element_ctx(ctx, el)))
    if name == "bbox":
        arr = a(0)  # array of [lon, lat] pairs
        xs = F.transform(arr, lambda p: p.getItem(0))
        ys = F.transform(arr, lambda p: p.getItem(1))
        return F.array(F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys))
    if name == "limit":
        return F.slice(a(0), 1, args[1].value if isinstance(args[1], Literal) else 1)
    raise DflCompileError(f"unknown function {name}()")


@dataclass
class _ElementCtx(Context):
    element: Column | None = None

    def whole_row(self) -> Column:
        return self.element

    def resolve_attr(self, path: tuple[str, ...]) -> Column:
        col = self.element
        for p in path:
            col = col[p]
        return col


def _element_ctx(ctx: Context, el: Column) -> Context:
    return _ElementCtx(df=ctx.df, variables=ctx.variables, element=el)


# --------------------------------------------------------------------------
# Pipeline level: @ = the whole collection (DataFrame).
# --------------------------------------------------------------------------

_COLLECTION_FNS = {"filter", "map", "sort", "limit", "len", "hist", "group", "set", "array", "bbox", "mean", "unique"}


def _is_whole(node: Node) -> bool:
    return isinstance(node, Attribute) and node.path == ()


def run_pipeline(
    df: DataFrame, text: str, variables: dict | None = None, return_vars: bool = False
):
    """Run a batch-mode DFL pipeline against a DataFrame.

    Returns a DataFrame for collection-valued results or a python value for
    scalar results (len/bbox/mean stages). With return_vars=True, returns
    (result, final_variables) so callers (ServiceExecHandler parity) can see
    the Assign bindings the pipeline produced."""
    node = _parser.parse(text)
    stages = node.stages if isinstance(node, Pipeline) else (node,)
    ctx = Context(df=df, variables=dict(variables or {}))
    current: Any = df
    for stage in stages:
        current = _run_stage(current, stage, ctx)
    if return_vars:
        return current, ctx.variables
    return current


_VALUE_COL = "value"


_NO_CONST = object()


def _const_eval(node: Node, variables: dict):
    """Driver-side evaluation of pure scalar expressions: literals, scalar
    variables, unary minus/not, arithmetic/concat/comparison/bool binaries.
    Go-DFL evaluates these eagerly, and eager values (unlike lazy Columns)
    are cacheable across service requests (ServiceExecHandler continuity).
    Returns _NO_CONST when the expression touches rows/columns or calls."""
    if isinstance(node, Literal):
        return node.value
    if isinstance(node, Variable):
        v = variables.get(node.name, _NO_CONST)
        if v is _NO_CONST or isinstance(v, (Column, DataFrame)):
            return _NO_CONST
        return v
    if isinstance(node, Unary):
        v = _const_eval(node.operand, variables)
        if v is _NO_CONST:
            return _NO_CONST
        if node.op == "-":
            return -v
        if node.op in ("not", "!"):
            return not v
        return _NO_CONST
    if isinstance(node, Ternary):
        cv = _const_eval(node.cond, variables)
        if cv is _NO_CONST:
            return _NO_CONST
        return _const_eval(node.then if cv else node.other, variables)
    if isinstance(node, Between):
        vv = _const_eval(node.value, variables)
        lo = _const_eval(node.lo, variables)
        hi = _const_eval(node.hi, variables)
        if _NO_CONST in (vv, lo, hi):
            return _NO_CONST
        try:
            return lo <= vv <= hi
        except TypeError:
            return _NO_CONST
    if isinstance(node, Binary):
        lv = _const_eval(node.left, variables)
        rv = _const_eval(node.right, variables)
        if lv is _NO_CONST or rv is _NO_CONST:
            return _NO_CONST
        try:
            match node.op:
                case "+":
                    return lv + rv
                case "-":
                    return lv - rv
                case "*":
                    return lv * rv
                case "/":
                    return lv / rv
                case "%":
                    return lv % rv
                case "==":
                    return lv == rv
                case "!=":
                    return lv != rv
                case "<":
                    return lv < rv
                case "<=":
                    return lv <= rv
                case ">":
                    return lv > rv
                case ">=":
                    return lv >= rv
                case "and":
                    return bool(lv) and bool(rv)
                case "or":
                    return bool(lv) or bool(rv)
                case "?:":  # elvis: left unless null
                    return lv if lv is not None else rv
        except TypeError:
            return _NO_CONST
    return _NO_CONST


def _eval_scalar(stage: Node, ctx: Context, current: Any):
    """Driver-side evaluation of a pipeline stage whose INPUT is already a
    Python scalar (e.g. ``len(@) | @ * 2``): ``@`` binds to the scalar
    (attribute paths index into dict scalars), ``len``/abs compose, and
    everything else defers to the pure-scalar evaluator. Raises a compile
    error for constructs that need rows — a scalar has none."""

    def subst(node: Node) -> Node:
        if isinstance(node, Attribute):
            v = current
            for part in node.path:
                if isinstance(v, dict):
                    v = v.get(part)
                else:
                    raise DflCompileError(
                        f"attribute path @{'.'.join(node.path)} on non-object "
                        f"scalar {type(current).__name__}"
                    )
            return Literal(v)
        if isinstance(node, Call):
            if node.name == "len" and len(node.args) == 1:
                inner = subst(node.args[0])
                if isinstance(inner, Literal):
                    return Literal(len(inner.value))
            raise DflCompileError(
                f"function {node.name}() is not defined on a scalar pipeline value"
            )
        if isinstance(node, Unary):
            return Unary(node.op, subst(node.operand))
        if isinstance(node, Binary):
            return Binary(node.op, subst(node.left), subst(node.right))
        if isinstance(node, Ternary):
            return Ternary(subst(node.cond), subst(node.then), subst(node.other))
        if isinstance(node, Between):
            return Between(subst(node.value), subst(node.lo), subst(node.hi))
        return node

    folded = _const_eval(subst(stage), ctx.variables)
    if folded is _NO_CONST:
        raise DflCompileError(
            "stage is not evaluable in scalar context (the previous pipeline "
            "stage produced a scalar, not a collection)"
        )
    return folded


def _run_stage(current: Any, stage: Node, ctx: Context):
    if isinstance(stage, Assign):
        folded = _const_eval(stage.value, ctx.variables)
        if folded is not _NO_CONST:
            # scalar bindings stay plain Python values — cacheable across
            # requests (ServiceExecHandler assignment continuity)
            ctx.variables[stage.name] = folded
        elif isinstance(current, DataFrame):
            ctx.df = current
            ctx.variables[stage.name] = compile_expr(stage.value, ctx)
        else:
            ctx.variables[stage.name] = current
        return current

    if not isinstance(current, DataFrame):
        # scalar context: plain expression evaluation driver-side
        ctx2 = Context(df=None, variables=ctx.variables)
        return _eval_scalar(stage, ctx2, current)

    df: DataFrame = current
    ctx.df = df

    if isinstance(stage, Call) and stage.name in _COLLECTION_FNS and stage.args:
        base = stage.args[0]
        if _is_whole(base):
            return _run_collection_fn(df, stage, ctx)
        if isinstance(base, Call) and base.name in _COLLECTION_FNS and base.args and (
            _is_whole(base.args[0])
            or (isinstance(base.args[0], Call) and base.args[0].name in _COLLECTION_FNS)
        ):
            # nested collection composition, e.g. array(set(@)) (bars.dfl:10)
            inner = _run_stage(df, base, ctx)
            if isinstance(inner, DataFrame):
                outer = Call(stage.name, (Attribute(()),) + stage.args[1:])
                return _run_stage(inner, outer, ctx)
            return inner

    if _is_whole(stage):
        return df

    # per-row projection stage (stream-mode semantics inside a pipeline)
    return _project_rows(df, stage, ctx)


def _run_collection_fn(df: DataFrame, stage: Call, ctx: Context):
    name = stage.name
    args = stage.args
    if name == "filter":
        pred = _sub_expr(args[1])
        return df.filter(compile_expr(pred, ctx))
    if name == "map":
        return _project_rows(df, _sub_expr(args[1]), ctx)
    if name == "sort":
        if len(args) == 1:
            cols = df.columns
            return df.orderBy(*cols)
        key = _sub_expr(args[1])
        desc = len(args) > 2 and isinstance(args[2], Literal) and args[2].value is True
        kc = compile_expr(key, ctx)
        return df.orderBy(kc.desc() if desc else kc.asc())
    if name == "limit":
        n = args[1].value if len(args) > 1 and isinstance(args[1], Literal) else None
        if n is None:
            raise DflCompileError("limit(@, n) needs a literal n")
        return df if n < 0 else df.limit(int(n))  # negative limit = unlimited (osm.sh:137)
    if name == "len":
        return df.count()
    if name in ("set", "unique"):
        return df.distinct()
    if name == "array":
        # array(set(@)) — materialization wrapper is a no-op on DataFrames
        inner = args[0]
        if isinstance(inner, Call) and inner.name in _COLLECTION_FNS:
            return _run_collection_fn(df, inner, ctx)
        return df
    if name == "hist":
        return _hist(df, args[1:], ctx)
    if name == "group":
        key = _sub_expr(args[1])
        kc = compile_expr(key, ctx)
        return df.groupBy(kc.alias("key")).agg(
            F.collect_list(ctx.whole_row()).alias("items")
        )
    if name == "bbox":
        # bbox over the collection's coordinate pairs -> [w, s, e, n]
        coords = _first_array_coord_col(df)
        row = df.agg(
            F.min(coords.getItem(0)).alias("w"),
            F.min(coords.getItem(1)).alias("s"),
            F.max(coords.getItem(0)).alias("e"),
            F.max(coords.getItem(1)).alias("n"),
        ).collect()[0]
        return [row["w"], row["s"], row["e"], row["n"]]
    if name == "mean":
        col = F.col(df.columns[0])
        return df.agg(F.avg(col)).collect()[0][0]
    raise DflCompileError(f"collection fn {name}")


def _first_array_coord_col(df: DataFrame) -> Column:
    for c, dt in df.dtypes:
        if dt.startswith("array"):
            return F.col(c)
    raise DflCompileError("bbox(@) needs an array coordinate column")


def _hist(df: DataFrame, key_args, ctx: Context) -> DataFrame:
    """hist(@,'k') -> (key, count); hist(@,'k1','k2') -> (key, key2, count).
    A second key yielding a set/array is explode-counted (multiset
    semantics, examples/osm.sh:130)."""
    if not key_args:
        col = F.col(df.columns[0])
        return df.groupBy(col.alias("key")).agg(F.count(F.lit(1)).alias("count")).orderBy("key")
    k1 = compile_expr(_sub_expr(key_args[0]), ctx)
    if len(key_args) == 1:
        return df.groupBy(k1.alias("key")).agg(F.count(F.lit(1)).alias("count")).orderBy("key")
    k2 = compile_expr(_sub_expr(key_args[1]), ctx)
    tmp = df.select(k1.alias("key"), k2.alias("__k2"))
    if dict(tmp.dtypes)["__k2"].startswith("array"):
        tmp = tmp.select("key", F.explode("__k2").alias("key2"))
    else:
        tmp = tmp.select("key", F.col("__k2").alias("key2"))
    return tmp.groupBy("key", "key2").agg(F.count(F.lit(1)).alias("count")).orderBy("key", "key2")


def _project_rows(df: DataFrame, expr: Node, ctx: Context) -> DataFrame:
    """Project each row through a DFL expression (map(@, ...) body or a
    stream-mode stage). Dict results expand to columns; other results
    become a single `value` column."""
    ctx.df = df
    if isinstance(expr, DictNode):
        cols = []
        for k, v in expr.pairs:
            name = str(k.value if isinstance(k, Literal) else k)
            cols.append(compile_expr(v, ctx).alias(name))
        return df.select(*cols)
    col = compile_expr(expr, ctx)
    return df.select(col.alias(_VALUE_COL))


def process(df: DataFrame, text: str, variables: dict | None = None) -> DataFrame:
    """Stream-mode per-object processing (railgun process --stream):
    evaluate the expression per row; null results drop the row
    (railgun/cli/process.go:184-189); dict results reshape the row."""
    node = _parser.parse(text)
    if isinstance(node, Pipeline):
        # per-object pipelines thread context through stages; stage k's
        # result is stage k+1's @
        out = df
        ctx = Context(df=df, variables=dict(variables or {}))
        for stage in node.stages:
            out = _process_one(out, stage, ctx)
        return out
    return _process_one(df, node, Context(df=df, variables=dict(variables or {})))


def _process_one(df: DataFrame, node: Node, ctx: Context) -> DataFrame:
    ctx.df = df
    if isinstance(node, Assign):
        ctx.variables[node.name] = compile_expr(node.value, ctx)
        return df
    if isinstance(node, Ternary) and _is_null_literal(node.then):
        # `cond ? null : expr` — the null-drop idiom (geonames.dfl:1-9).
        # SQL three-valued semantics BY DESIGN: a NULL condition also drops
        # the row (filter(~NULL) = filter(NULL) = drop), matching the
        # `WHERE NOT (cond)` form the DuckDB oracle gate pins — both
        # directions of the idiom treat an unknowable condition as a drop,
        # which for a data-cleaning filter is the conservative side.
        keep = ~compile_expr(node.cond, ctx)
        return _process_one(df.filter(keep), node.other, ctx)
    if isinstance(node, Ternary) and _is_null_literal(node.other):
        keep = compile_expr(node.cond, ctx)
        return _process_one(df.filter(keep), node.then, ctx)
    if isinstance(node, DictNode):
        return _project_rows(df, node, ctx)
    if _is_whole(node):
        return df
    return _project_rows(df, node, ctx)


def _is_null_literal(node: Node) -> bool:
    return isinstance(node, Literal) and node.value is None
