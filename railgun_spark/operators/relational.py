"""Relational operator suite: filters, projections, aggregations, sorts,
top-k, joins, windows, set ops — the Spark-native surface that subsumes the
reference's DFL collection operators.

Reference parity notes (spatialcurrent/railgun):
- filter/predicate semantics:   examples/bars.dfl:8, cli/process.go:184-189
- map/dict construction:        examples/geonames.dfl:10-26, athena.dfl:1-7
- hist (1/2-arg):               examples/osm.sh:124,130, hostosm.sh:46
- sort|limit top-k:             README.md:82, examples/bars.dfl:11-12
- in/iin/like/ilike/between:    examples/osm.sh:66,74,83, mexican.dfl:8
- len/set/array(set):           named/named.go:16, bars.dfl:10
- joins/windows: absent in the reference (SURVEY §2.4/2.5); provided here as
  the engine's superset, required by the oracle harness.

Scale notes (100 TB design point): every query is a declarative plan —
filters/projections push into the parquet scan, aggregations get map-side
partial aggregation, small dimension tables (region/nation/supplier: KBs
even at SF 100k) are broadcast so the only shuffles are on the large-table
group/join keys. No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from railgun_spark.sources.tables import load_events
from railgun_spark.suite import extra_query, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # route through load_table: a future _t(..., "events") call must get the
    # timestamp-normalized frame, not a raw nanos/NTZ-encoded read
    from railgun_spark.sources.tables import load_table

    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation: pricing summary (TPC-H Q1 shape) — the flagship query.
# hist/group/len analogs: SURVEY §2.3 (osm.sh:124, named/named.go:16).
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Map-side partial agg; 2-col group key => tiny shuffle at any SF.",
    tags=("agg", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Join + agg + top-k (TPC-H Q3 shape). sort|limit: SURVEY §2.6.
# --------------------------------------------------------------------------
@query(
    "top_orders_by_revenue",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="customer broadcast; orders+lineitem shuffle on orderkey; TakeOrdered top-k.",
    tags=("join", "topk"),
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-join star query (TPC-H Q5 shape) — broadcast the dimension chain.
# --------------------------------------------------------------------------
@query(
    "region_nation_revenue",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="nation/region broadcast (constant-size dims); customer/supplier "
    "scale with SF, so their join strategy is left to AQE — broadcast at "
    "small SF, shuffle join at 100 TB.",
    tags=("join", "agg"),
)
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Pure filter-aggregate (TPC-H Q6 shape): between-range predicates.
# between/within: SURVEY §2.2 (athena.dfl:20-21, pipeline/Pipeline.go:7).
# --------------------------------------------------------------------------
@extra_query(
    "revenue_range_filter",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    doc="All predicates push to the parquet scan (row-group skipping).",
    tags=("filter", "agg"),
)
def revenue_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# ilike wildcard filter (mexican.dfl:8 `@properties?.name ilike %taco%`).
# --------------------------------------------------------------------------
@extra_query(
    "filter_ilike",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           round(sum(p_retailprice), 2) AS total_price
    FROM part
    WHERE p_name ILIKE '%WIDGET%'
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="ilike => case-insensitive LIKE; stays in WholeStageCodegen.",
    tags=("filter",),
)
def filter_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").ilike("%WIDGET%"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# in / iin membership (osm.sh:66 `@properties.amenity in [clinic, ...]`,
# osm.sh:74 `iin` case-insensitive variant).
# --------------------------------------------------------------------------
@extra_query(
    "filter_membership",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND lower(o_orderstatus) IN ('o', 'f')
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="isin => In predicate, pushed down.",
    tags=("filter",),
)
def filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.lower(F.col("o_orderstatus")).isin("o", "f")
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# hist(@, 'keyExpr') — 1-arg histogram (osm.sh:124, hostosm.sh:46).
# --------------------------------------------------------------------------
@extra_query(
    "hist_event_type",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
    """,
    doc="hist(xs) == groupBy(col).count().",
    tags=("agg", "hist"),
)
def hist_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


# --------------------------------------------------------------------------
# hist(@, 'k1', 'k2') — nested histogram (osm.sh:130).
# --------------------------------------------------------------------------
@extra_query(
    # r12 rotation: demoted to EXTRA — multi-key groupBy capability stays
    # driver-certified by the DFL hist path (dfl_filter_hist) and the
    # rotated-in flagships take the slots.
    "hist_nested",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    ORDER BY event_type, day
    """,
    doc="Nested hist == multi-key groupBy; partial agg keeps the shuffle small.",
    tags=("agg", "hist"),
)
def hist_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_events(spark, sf_dir)
        .groupBy("event_type", F.to_date(F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# JSON attribute access — schema-on-read path (railgun objects are dynamic
# maps, SURVEY §1.2; props column is a JSON document).
# --------------------------------------------------------------------------
@query(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
           max(CAST(props->>'k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="get_json_object stays JVM-side; no Python in the loop.",
    tags=("json",),
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        load_events(spark, sf_dir)
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"), F.max("k").alias("max_k"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# distinct | sort | limit (bars.dfl:10-12 `array(set(@)) | sort | limit`).
# --------------------------------------------------------------------------
@extra_query(
    "distinct_sort_limit",
    oracle="""
    SELECT DISTINCT c_mktsegment
    FROM customer
    ORDER BY c_mktsegment
    LIMIT 3
    """,
    doc="set() => distinct; sort|limit => TakeOrdered.",
    tags=("set", "topk"),
)
def distinct_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment").limit(3)


# --------------------------------------------------------------------------
# map / dict construction + casts + concat + slugify
# (geonames.dfl:10-26 dict build; railgun/Slugify.go:14-20).
# --------------------------------------------------------------------------
@extra_query(
    "project_construct",
    oracle="""
    SELECT n_nationkey AS id,
           concat('nation/', lower(n_name)) AS slug,
           regexp_replace(lower(n_name), '[^a-z0-9]+', '-', 'g') AS slugified,
           CAST(n_regionkey AS BIGINT) AS region_id,
           length(n_name) AS name_len
    FROM nation
    ORDER BY id
    """,
    doc="Pure projection: column pruning reads 3 columns only.",
    tags=("project",),
)
def project_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return (
        n.select(
            F.col("n_nationkey").alias("id"),
            F.concat(F.lit("nation/"), F.lower("n_name")).alias("slug"),
            F.regexp_replace(F.lower("n_name"), "[^a-z0-9]+", "-").alias("slugified"),
            F.col("n_regionkey").cast("bigint").alias("region_id"),
            F.length("n_name").alias("name_len"),
        )
        .orderBy("id")
    )


# --------------------------------------------------------------------------
# Global aggregate stats — the af.Functions catalog surface
# (max/min/sum/mean, router/RailgunRouter.go:60-65; len: named/named.go:16).
# --------------------------------------------------------------------------
@extra_query(
    "agg_global_stats",
    oracle="""
    SELECT count(*) AS n,
           count(DISTINCT l_orderkey) AS n_orders,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_extendedprice), 4) AS avg_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    """,
    doc="Single-pass global agg; countDistinct is the only real shuffle.",
    tags=("agg",),
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


# --------------------------------------------------------------------------
# Window functions: rank-per-group top-k (Spark superset; SURVEY §2.5).
# --------------------------------------------------------------------------
@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
    doc="Per-group top-k via row_number; raw doubles compare exactly.",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    )


# --------------------------------------------------------------------------
# Running windows: lag + cumulative sum (engine superset).
# --------------------------------------------------------------------------
@extra_query(
    "window_running",
    oracle="""
    SELECT user_id, event_id, value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, event_id
    """,
    doc="Sessionization primitive: per-user ordered window, single shuffle on user_id.",
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_events(spark, sf_dir)
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            "value",
            F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
                "running_value"
            ),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# sort desc | limit — the README tsunami pipeline
# (`sort(@, '@properties?.mag', true) | limit(@, 10)`, README.md:82).
# --------------------------------------------------------------------------
@extra_query(
    "sort_desc_limit",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 10
    """,
    doc="TakeOrderedAndProject: no full sort materialization.",
    tags=("topk",),
)
def sort_desc_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_events(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .orderBy(F.desc("value"), "event_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set operations over datasets (engine superset of §2.7's array sets).
# --------------------------------------------------------------------------
@extra_query(
    # r12 rotation: demoted to EXTRA — INTERSECT/set capability remains
    # covered by the DFL set-literal paths; slot freed for
    # media_refusal_report.
    "set_ops_datasets",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="INTERSECT => semi-join on the distinct sets.",
    tags=("set",),
)
def set_ops_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp).orderBy("nationkey")


# --------------------------------------------------------------------------
# Array set algebra on grouped values (set()/`-`/intersects, SURVEY §2.7).
# Sorted arrays so cross-engine order matches.
# --------------------------------------------------------------------------
@extra_query(
    "array_set_algebra",
    oracle="""
    SELECT n_regionkey AS region_id,
           list_aggr(list_sort(list_distinct(list(n_name))), 'string_agg', ',') AS nations,
           len(list_distinct(list(n_name))) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY region_id
    """,
    doc="collect_set + array_sort == set(@) with deterministic layout. "
    "The set is serialized to a comma-joined string so cross-engine "
    "comparison (and pandas canonicalization) stays on hashable scalars.",
    tags=("set", "agg"),
)
def array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "nation")
        .groupBy(F.col("n_regionkey").alias("region_id"))
        .agg(F.array_sort(F.collect_set("n_name")).alias("__s"))  # ONE agg buffer
        .select(
            "region_id",
            F.array_join("__s", ",").alias("nations"),
            F.size("__s").alias("n_nations"),
        )
        .orderBy("region_id")
    )


# --------------------------------------------------------------------------
# Anti-join (relational complement of the reference's null-drop filter).
# --------------------------------------------------------------------------
@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
    doc="left_anti join — broadcast when the subquery side is small.",
    tags=("join",),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup (engine superset; reference has none, SURVEY §2.3).
# --------------------------------------------------------------------------
@extra_query(
    "rollup_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    doc="rollup => single shuffle with grouping-id expansion.",
    tags=("agg",),
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )
