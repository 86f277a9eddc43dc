"""DFL pipelines exposed as oracle-checked suite queries.

These prove the DFL->Catalyst compiler end-to-end: the same pipeline a
railgun user would write (filter/map/hist/sort/limit with bare words, `in`
membership, between, ternary null-drop, casts — SURVEY §2.2) compiles to a
DataFrame plan whose results hash-match plain SQL on DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from railgun_spark.dfl import process, run_pipeline
from railgun_spark.sources.tables import load_events
from railgun_spark.suite import extra_query, query


@query(
    "dfl_filter_hist",
    oracle="""
    SELECT o_orderstatus AS key, count(*) AS count
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    ORDER BY key
    """,
    doc="DFL: filter(@, '@o_orderpriority in [...]') | hist(@, '@o_orderstatus') "
    "(bare-word membership, osm.sh:66; hist, osm.sh:124).",
    tags=("dfl",),
)
def dfl_filter_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return run_pipeline(
        orders,
        "filter(@, \"@o_orderpriority in ['1-URGENT', '2-HIGH']\") | hist(@, '@o_orderstatus')",
    )


@extra_query(
    "dfl_project_construct",
    oracle="""
    SELECT n_nationkey AS id,
           concat('nation/', lower(n_name)) AS slug,
           CAST(n_regionkey AS BIGINT) AS region_id
    FROM nation
    ORDER BY id
    """,
    doc="DFL dict construction + casts + concat (geonames.dfl:10-26 shape).",
    tags=("dfl", "project"),
)
def dfl_project_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = run_pipeline(
        nation,
        "map(@, '{id: @n_nationkey, slug: \"nation/\" + lower(@n_name), "
        "region_id: int64(@n_regionkey)}')",
    )
    return out.orderBy("id")


@extra_query(
    "dfl_sort_desc_limit",
    oracle="""
    SELECT value FROM events ORDER BY value DESC LIMIT 10
    """,
    doc="DFL top-k (README.md:82 tsunami shape): map | sort desc | limit. "
    "Single-column projection so tied values hash identically.",
    tags=("dfl", "topk"),
)
def dfl_sort_desc_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return run_pipeline(ev, "map(@, '@value') | sort(@, '@value', true) | limit(@, 10)")


@extra_query(
    "dfl_stream_null_drop",
    oracle="""
    SELECT doc_id AS id, lang, CAST(n_chars AS BIGINT) AS chars,
           concat(lang, '/', CAST(doc_id AS VARCHAR)) AS slug
    FROM documents
    WHERE NOT (n_chars < 100)
    ORDER BY id
    """,
    doc="Stream-mode per-object eval with the ternary null-drop convention "
    "(cli/process.go:184-189, geonames.dfl:1-9).",
    tags=("dfl", "stream"),
)
def dfl_stream_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = process(
        docs,
        "(@n_chars < 100) ? null : "
        "{id: @doc_id, lang: @lang, chars: int64(@n_chars), "
        "slug: @lang + \"/\" + string(@doc_id)}",
    )
    return out.orderBy("id")


@extra_query(
    "dfl_between_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05
      AND l_returnflag == 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="DFL between + comparison + bare-word equality (athena.dfl:20-21).",
    tags=("dfl", "filter"),
)
def dfl_between_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = run_pipeline(
        li,
        "filter(@, '(@l_quantity between 10 and 20) and (@l_discount > 0.05) "
        "and (@l_returnflag == R)') "
        "| map(@, '{l_orderkey: @l_orderkey, l_linenumber: @l_linenumber, "
        "l_quantity: @l_quantity, l_discount: @l_discount}')",
    )
    return out.orderBy("l_orderkey", "l_linenumber")
