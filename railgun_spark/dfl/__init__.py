"""DFL (Dynamic Filter Language) — parser + Catalyst compiler.

The reference's query language (go-dfl, used throughout
spatialcurrent/railgun: examples/*.dfl, railgun/pipeline/Pipeline.go,
railgun/named/named.go). The upstream implementation is an interpreted AST
walker evaluated per object (railgun/cli/process.go:918); here DFL compiles
to Catalyst expressions and DataFrame transformations, so Spark's optimizer
and codegen execute it — the reference itself points at this design with its
Node.Sql() renderer (railgun/cli/eval.go:121,159).

Public API:
    parse(text) -> Node                      (AST)
    compile_expr(node, ctx) -> Column        (scalar/per-row expression)
    run_pipeline(df, text, variables) -> DataFrame | scalar
    process(df, expr, variables) -> per-object stream semantics
      (null result drops the row — railgun/cli/process.go:184-189)
"""

from railgun_spark.dfl.parser import parse  # noqa: F401
from railgun_spark.dfl.compiler import (  # noqa: F401
    compile_expr,
    process,
    run_pipeline,
)
