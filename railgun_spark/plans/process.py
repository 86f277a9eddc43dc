"""`railgun process` equivalent: read objects from a URI, evaluate a DFL
expression (batch pipeline or per-object stream), write to an output URI —
where the output URI may be a DFL expression over per-object attributes
(dynamic partitioned sink).

Reference lifecycle (SURVEY §3.1, railgun/cli/process.go:519-945):
flag parse -> reader -> format inference -> DFL parse/compile -> evaluate
-> serialize/write, with the stream path fanning objects out to per-path
writers under fd semaphores (cli/process.go:283-403).

Spark-first: the writer pool disappears — a dynamic output URI becomes
generated partition columns + `write.partitionBy`, which is exactly the
scalable version of content-based fan-out (examples/geonames.sh:49 writes
$dir + "/tiles/" + @properties._tile_z + "-" + ..., i.e. a tile-sharded
layout; here that is partitionBy("_tile_z","_tile_x","_tile_y") and reads
get partition pruning for free).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from railgun_spark.dfl import parser as _parser
from railgun_spark.dfl.ast import Attribute, Binary, Literal, Node, Variable
from railgun_spark.dfl.compiler import (
    Context,
    DflCompileError,
    compile_expr,
    process as _process_rows,
    run_pipeline,
)
from railgun_spark.sources import formats


@dataclass
class DynamicSink:
    """Decomposition of an output-URI DFL expression into a static base
    directory plus per-object partition columns."""

    base: str
    partition_cols: list[str]
    generated: dict[str, Column]


def analyze_output_uri(uri_expr: str, variables: dict | None, df: DataFrame) -> DynamicSink | None:
    """If the output URI is a DFL string-concat expression over attributes
    (the geonames.sh:49 pattern), extract the attribute references as
    generated partition columns. Returns None for a fully static URI."""
    try:
        node = _parser.parse(uri_expr)
    except Exception:
        return None
    if isinstance(node, Literal):
        return None
    parts: list[Node] = []

    def flatten(n: Node):
        if isinstance(n, Binary) and n.op == "+":
            flatten(n.left)
            flatten(n.right)
        else:
            parts.append(n)

    flatten(node)
    ctx = Context(df=df, variables=dict(variables or {}))
    base_parts: list[str] = []
    generated: dict[str, Column] = {}
    order: list[str] = []
    static_prefix = True
    for p in parts:
        if isinstance(p, Literal):
            if static_prefix:
                base_parts.append(str(p.value))
            continue
        if isinstance(p, Variable):
            v = ctx.variables.get(p.name)
            if static_prefix and v is not None and not isinstance(v, Column):
                base_parts.append(str(v))
                continue
        # everything else (attributes, computed expressions) becomes a
        # generated partition column
        static_prefix = False
        name = "_p_" + "_".join(p.path) if isinstance(p, Attribute) else f"_p{len(order)}"
        if name not in generated:
            try:
                generated[name] = compile_expr(p, ctx).cast("string")
            except DflCompileError as e:
                raise DflCompileError(
                    f"dynamic output-uri part is not computable per-row "
                    f"({e}); bind the variable or use a static output uri"
                ) from e
            order.append(name)
    if not generated:
        return None
    return DynamicSink(base="".join(base_parts).rstrip("/-_"), partition_cols=order, generated=generated)


def process_uri(
    spark: SparkSession,
    input_uri: str,
    expr: str | None = None,
    output_uri: str | None = None,
    variables: dict | None = None,
    stream: bool = False,
    input_options: dict | None = None,
    output_format: str | None = None,
    output_mode: str = "overwrite",
    output_limit: int | None = None,
    output_passphrase: str | None = None,
    output_salt: str | None = None,
) -> DataFrame | None:
    """End-to-end process: read -> evaluate -> write (or return the frame).

    stream=True applies per-object semantics (null drops rows,
    cli/process.go:184-189); otherwise the expression is a batch pipeline
    over the whole collection (cli/process.go:918)."""
    df = formats.read(spark, input_uri, **(input_options or {}))
    if expr:
        result = _process_rows(df, expr, variables) if stream else run_pipeline(df, expr, variables)
    else:
        result = df
    if output_uri is None:
        return result if isinstance(result, DataFrame) else _scalar_frame(spark, result)
    if not isinstance(result, DataFrame):
        result = _scalar_frame(spark, result)

    sink = analyze_output_uri(output_uri, variables, result)
    if sink is None:
        formats.write(
            result, output_uri, fmt=output_format, mode=output_mode,
            limit=output_limit, passphrase=output_passphrase, salt=output_salt,
        )
        return None
    if output_passphrase:
        # the .enc block cipher forces a whole-payload single-file write
        # (process.go:663) — that cannot compose with a dynamic partitioned
        # sink, and silently writing cleartext would be the worst outcome
        raise ValueError(
            "encrypted output (.enc/passphrase) is not supported with a "
            "dynamic output URI; write to a static .enc path instead"
        )
    out = result
    for name, col in sink.generated.items():
        out = out.withColumn(name, col)
    formats.write(
        out,
        sink.base,
        fmt=output_format,
        mode=output_mode,
        partition_by=sink.partition_cols,
        limit=output_limit,
    )
    return None


def _scalar_frame(spark: SparkSession, value) -> DataFrame:
    if isinstance(value, (list, tuple)):
        return spark.createDataFrame([{"value": v, "i": i} for i, v in enumerate(value)])
    return spark.createDataFrame([{"value": value}])
