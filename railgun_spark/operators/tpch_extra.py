"""TPC-H physical-shape completions (Q3, Q5, Q6, Q12, Q15 analogs) —
engine-superset coverage: the Go reference has no joins or SQL at all
(its full query surface is the DFL pipeline language, SURVEY.md §2.2);
these exist so every CLASSIC analytic join/agg shape has a certified,
scale-shaped plan in the suite. Shapes not yet demonstrated elsewhere:

- Q3:  multi-predicate pruned 3-way join feeding a composite top-k
       (group on a fact key AFTER the join, TakeOrdered on the agg);
- Q5:  the CYCLIC join constraint (customer and supplier must share a
       nation) — the one join topology Catalyst cannot plan as a pure
       star; the nation equality rides the fact join as a post-filter;
- Q6:  pure scan-filter-aggregate — zero joins, zero shuffles past the
       partial agg; the plan IS the pushdown story;
- Q12: two-class conditional aggregation over a date-windowed join
       (CASE WHEN inside sum, one fact shuffle);
- Q15: argmax-of-aggregate decorrelation (the scalar `= (SELECT max)`
       over a derived revenue view, lowered to a broadcast of the
       1-row max joined back on rounded equality).

Float discipline (suite.py header): every arithmetic-derived revenue is
round(..., 0) on BOTH sides; the Q15 argmax compares ROUNDED revenues so
the winner set is engine-deterministic.

The testdata star schema has no partsupp/shipmode columns; where the
canonical query needs one, the nearest existing attribute stands in
(o_orderpriority for Q12's shipmode classes) — the physical shape, which
is what the suite certifies, is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from railgun_spark.suite import extra_query, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@query(
    "shipping_priority_topk",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue,
           o_orderdate
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment/date predicates prune BOTH scans before "
    "the join; customer (filtered, small) broadcasts into orders, the "
    "one fact shuffle groups on l_orderkey, TakeOrdered caps the sort.",
    tags=("join", "agg", "topk"),
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    cutoff = F.lit("1998-07-01 00:00:00").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape with its defining CYCLIC constraint "
    "(c_nationkey = s_nationkey): customer and supplier dims broadcast "
    "onto the fact independently, the cycle closes as a cheap map-side "
    "equality filter after both attach — no second fact shuffle.",
    tags=("join", "agg", "cyclic"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # region-pruned nation list broadcasts into customer BEFORE the fact
    # join so non-ASIA customers never ride the shuffle
    asia_nat = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(asia_nat),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey", "n_name")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))  # the cycle
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@extra_query(
    "forecast_revenue_change",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 0) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate — every predicate "
    "reaches the parquet scan (PushedFilters), the aggregate is one "
    "map-side partial + one 1-row exchange; no join, no wide shuffle. "
    "The plan is the whole point: at 100 TB this is I/O-bound and "
    "row-group pruning on l_shipdate does the work.",
    tags=("scan", "agg", "pushdown"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 0)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@extra_query(
    "priority_class_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (o_orderpriority standing in for the absent "
    "l_shipmode): date-pruned fact joins orders on the order key, "
    "two-class CASE-WHEN counts fold map-side into one tiny aggregate.",
    tags=("join", "agg", "conditional"),
)
def priority_class_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@extra_query(
    "top_supplier_by_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 0) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: the revenue 'view' is one quarter-pruned fact "
    "aggregate; the scalar max decorrelates into a 1-row broadcast "
    "joined back on ROUNDED equality (engine-deterministic winner set); "
    "supplier detail attaches after the argmax, never before.",
    tags=("join", "subquery", "argmax", "decorrelation"),
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(sup), rev.suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Product-type profit (TPC-H Q9 shape): a name-substring part filter
# pruning the fact before a 4-dim join, grouped by (nation, order year).
# --------------------------------------------------------------------------
@query(
    "product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (profit simplified to discounted revenue — no "
    "partsupp cost column in the testdata): the LIKE-filtered part list "
    "broadcasts into the fact FIRST so only ~13% of lineitem rides the "
    "order join; supplier/nation broadcast; one fact shuffle for the "
    "(nation, year) aggregate.",
    tags=("join", "agg", "like"),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
             .alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Important part stock (TPC-H Q11 shape): per-group value filtered
# against a FRACTION OF THE GLOBAL TOTAL — the group-vs-global-scalar
# HAVING pattern. The total is computed over the ROUNDED per-part values
# (exact integer sum), so the threshold comparison is engine-exact.
# --------------------------------------------------------------------------
@query(
    "important_part_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey AS pk,
             round(sum(l_extendedprice), 0) AS value
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT pk, value FROM val
    WHERE value > 0.001 * (SELECT sum(value) FROM val)
    ORDER BY value DESC, pk
    LIMIT 50
    """,
    doc="TPC-H Q11 shape: nation-pruned per-part value aggregate, global "
    "scalar threshold decorrelated into a 1-row broadcast; the scalar "
    "sums ROUNDED group values (exact integers) so the > comparison "
    "cannot drift between engines.",
    tags=("join", "subquery", "having", "decorrelation"),
)
def important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    nat_sup = sup.join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_sup), li.l_suppkey == nat_sup.s_suppkey)
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.round(F.sum("l_extendedprice"), 0).alias("value"))
    )
    total = val.agg(F.sum("value").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("pk", "value")
        .orderBy(F.desc("value"), "pk")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Part-supplier variety (TPC-H Q16 shape): DISTINCT-supplier counts per
# part attribute with a NOT-IN supplier exclusion lowered to left_anti.
# --------------------------------------------------------------------------
@extra_query(
    # r14 rotation: demoted to EXTRA (one of nine TPC-H join+agg shapes in
    # the gate; distinct-count + anti-join are both certified elsewhere)
    # to make gate room for the r14 flagships.
    "part_supplier_variety",
    oracle="""
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'ECONOMY'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p_brand, p_size
    LIMIT 40
    """,
    doc="TPC-H Q16 shape (negative-balance suppliers standing in for the "
    "complaint-comment exclusion): NOT IN lowers to a broadcast "
    "left_anti on the tiny exclusion list, attribute-filtered parts "
    "broadcast into the fact, one shuffle for the distinct count.",
    tags=("join", "anti", "distinct", "agg"),
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "ECONOMY") & F.col("p_size").isin(1, 14, 23, 45)
    ).select("p_partkey", "p_brand", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
        .limit(40)
    )
