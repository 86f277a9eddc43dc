"""Product-analytics staples over the events stream: cohort retention and
ordered funnel conversion.

The reference ships event histograms and time filters (see
`/root/reference/railgun/examples` usage of hist/filter over feature
streams); retention and funnels are the canonical compositions a user of
those primitives builds next, so the engine provides them as first-class,
scale-shaped operators:

- Retention: ONE corpus-proportional shuffle to dedup (day, user); the
  per-user first-day reduction and the cohort rollup both reuse keys that
  are strict functions of already-shuffled columns (partial aggregation
  keeps them map-heavy).
- Funnel: each stage pre-filters the events scan by event_type BEFORE its
  equi-join (predicate pushdown to parquet), so stage joins shrink
  monotonically; no window over the full stream, no cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from railgun_spark.sources.tables import load_events
from railgun_spark.suite import extra_query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-active day; for each (cohort,
# day-offset) the number of cohort members active that day. Because the
# (day, user) grid is deduped first, the cohort rollup needs count(*), not
# count(DISTINCT) — one fewer distinct pass at 100 TB.
# --------------------------------------------------------------------------
@extra_query(
    "cohort_retention",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), firsts AS (
      SELECT user_id, min(day) AS cohort_day FROM daily GROUP BY user_id
    )
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, d.day) AS day_offset,
           count(*) AS active_users
    FROM daily d JOIN firsts f ON d.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="First-active-day cohorts x day offset: one (day,user) dedup "
    "shuffle, then equi-joins/rollups on derived keys; count(*) not "
    "count(DISTINCT) because the grid is pre-deduped.",
    tags=("agg", "retention", "events"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_events(spark, sf_dir)
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    firsts = daily.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        daily.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------------
# Ordered funnel: view -> click (strictly after the user's FIRST view) ->
# purchase (strictly after that first qualifying click). Stage frames are
# unioned with a stage tag and counted in one conditional aggregate, so the
# summary row needs no 1-row cross join (keeps the plan NLJ-free).
# --------------------------------------------------------------------------
@extra_query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
    ), s AS (
      SELECT 1 AS stage FROM v
      UNION ALL SELECT 2 FROM c
      UNION ALL SELECT 3 FROM p
    )
    SELECT n_view, n_click, n_purchase,
           round(n_click * 1.0 / n_view, 4) AS view_to_click,
           round(n_purchase * 1.0 / n_click, 4) AS click_to_purchase
    FROM (
      SELECT count(CASE WHEN stage = 1 THEN 1 END) AS n_view,
             count(CASE WHEN stage = 2 THEN 1 END) AS n_click,
             count(CASE WHEN stage = 3 THEN 1 END) AS n_purchase
      FROM s
    )
    """,
    doc="Strictly-ordered 3-stage funnel: per-stage type filter pushed to "
    "the scan, equi-join against the prior stage's per-user min-ts, "
    "monotonically shrinking joins, conditional-agg summary (no cross "
    "join).",
    tags=("agg", "funnel", "events"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .select("user_id")
        .distinct()
    )
    stages = (
        v.select(F.lit(1).alias("stage"))
        .unionAll(c.select(F.lit(2).alias("stage")))
        .unionAll(p.select(F.lit(3).alias("stage")))
    )
    counted = stages.agg(
        F.count(F.when(F.col("stage") == 1, 1)).alias("n_view"),
        F.count(F.when(F.col("stage") == 2, 1)).alias("n_click"),
        F.count(F.when(F.col("stage") == 3, 1)).alias("n_purchase"),
    )
    return counted.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click") * 1.0 / F.col("n_view"), 4).alias("view_to_click"),
        F.round(F.col("n_purchase") * 1.0 / F.col("n_click"), 4).alias(
            "click_to_purchase"
        ),
    )


# --------------------------------------------------------------------------
# Table profiling: per-column null count + exact distinct count in ONE pass
# (a single agg row, unpivoted with stack). Counts are exact integers — no
# float parity surface. At 100 TB the same shape runs with
# approx_count_distinct (HLL partials, mergeable, no expand blow-up); the
# exact form is the oracle-checkable twin.
# --------------------------------------------------------------------------
PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@extra_query(
    "profile_orders_columns",
    oracle="""
    SELECT col_name, n_nulls, n_distinct FROM (
      SELECT 'o_orderkey' AS col_name,
             count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
             count(DISTINCT o_orderkey) AS n_distinct FROM orders
      UNION ALL
      SELECT 'o_custkey', count(CASE WHEN o_custkey IS NULL THEN 1 END),
             count(DISTINCT o_custkey) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
             count(DISTINCT o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(CASE WHEN o_totalprice IS NULL THEN 1 END),
             count(DISTINCT o_totalprice) FROM orders
      UNION ALL
      SELECT 'o_orderdate', count(CASE WHEN o_orderdate IS NULL THEN 1 END),
             count(DISTINCT o_orderdate) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
             count(DISTINCT o_orderpriority) FROM orders
    )
    ORDER BY col_name
    """,
    doc="Single-pass per-column profile (nulls + exact distinct) unpivoted "
    "to long form; swap count_distinct for approx_count_distinct at PB "
    "scale (mergeable HLL partials).",
    tags=("profile", "quality"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    aggs = []
    for c in PROFILE_COLS:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct" for c in PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        )
    ).orderBy("col_name")


# --------------------------------------------------------------------------
# Fixed-width value histogram. Bucket index is pure arithmetic on each row
# (map-side, codegen); the only shuffle carries NUM_BUCKETS keys. Explicit
# floor((x - lo) / width) on BOTH engines (portable; identical IEEE ops)
# instead of engine-specific width_bucket.
# --------------------------------------------------------------------------
HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 500.0, 10


@extra_query(
    "value_histogram_events",
    oracle=f"""
    SELECT least({HIST_BUCKETS - 1},
                 floor((value - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BUCKETS}))
             ::BIGINT AS bucket,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Fixed-width numeric histogram: map-side bucket arithmetic, "
    f"{HIST_BUCKETS}-key shuffle. Same floor((x-lo)/w) expression on both "
    "engines.",
    tags=("agg", "histogram"),
)
def value_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    width = (HIST_HI - HIST_LO) / HIST_BUCKETS
    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    bucket = F.least(
        F.lit(HIST_BUCKETS - 1),
        F.floor((F.col("value") - HIST_LO) / width),
    ).cast("bigint")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Time-series gap fill + trailing moving average. The date spine is
# GENERATED from the 1-row min/max aggregate (explode(sequence(...))) — no
# driver round-trip, no cross join — then left-joined with the daily rollup
# and zero-filled. Daily sums are round()ed BEFORE the moving average on
# both engines, so the MA consumes bit-identical inputs and its own
# round() is safe.
# --------------------------------------------------------------------------
@extra_query(
    "daily_revenue_gapfill",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    ), bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM daily
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), filled AS (
      SELECT s.day,
             coalesce(d.n_orders, 0) AS n_orders,
             coalesce(d.revenue, 0.0) AS revenue
      FROM spine s LEFT JOIN daily d ON s.day = d.day
    )
    SELECT day, n_orders, revenue,
           round(avg(revenue) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS revenue_ma7
    FROM filled
    ORDER BY day
    """,
    doc="Dense date spine from explode(sequence(min,max)) over the 1-row "
    "bounds agg (no driver round-trip), left join + zero fill, 7-day "
    "trailing MA over pre-rounded daily sums.",
    tags=("agg", "timeseries", "window"),
)
def daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    filled = (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )
    ma = Window.orderBy("day").rowsBetween(-6, 0)
    return filled.select(
        "day",
        "n_orders",
        "revenue",
        F.round(F.avg("revenue").over(ma), 2).alias("revenue_ma7"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Z-score anomaly flagging over daily event volumes. Per-type mean/std are
# round()ed before z-scores are derived, re-syncing any aggregation-order
# or variance-algorithm (Welford vs sum-of-squares) drift between engines;
# the stats frame is type-cardinality-sized, so its join back onto the
# daily counts broadcasts.
# --------------------------------------------------------------------------
@extra_query(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             round(avg(n), 4) AS mean_n,
             round(stddev_samp(n), 4) AS std_n
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n,
           round((d.n - s.mean_n) / s.std_n, 3) AS z
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    WHERE abs((d.n - s.mean_n) / s.std_n) >= 1.5
    ORDER BY d.event_type, d.day
    """,
    doc="Daily-volume outliers per event type: tiny (type,day) rollup, "
    "per-type mean/std rounded before z (re-syncs variance-algorithm "
    "drift), broadcast stats join, |z|>=1.5 flag.",
    tags=("agg", "anomaly", "events"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.round(F.avg("n"), 4).alias("mean_n"),
        F.round(F.stddev_samp("n"), 4).alias("std_n"),
    )
    z = (F.col("n") - F.col("mean_n")) / F.col("std_n")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) >= 1.5)
        .select("event_type", "day", "n", F.round(z, 3).alias("z"))
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Event-sequence analytics: both operators below ride ONE shuffle — the
# window partition on user_id — then reduce to tiny keys (type pairs /
# buckets), so the expensive part is shared with sessionization and any
# other per-user sequence op in the same pipeline stage.
# --------------------------------------------------------------------------
@extra_query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
    doc="First-order Markov transition counts over per-user event "
    "sequences: one user_id window shuffle, (type,type)-key rollup; "
    "(ts, event_id) ordering makes simultaneous events deterministic.",
    tags=("events", "sequence", "window"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_events(spark, sf_dir)
        .select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "next_type")
    )


@extra_query(
    "inter_event_time_hist",
    oracle="""
    WITH gaps AS (
      SELECT date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events
    )
    SELECT CASE
             WHEN gap_s < 4 THEN 0       WHEN gap_s < 16 THEN 1
             WHEN gap_s < 64 THEN 2      WHEN gap_s < 256 THEN 3
             WHEN gap_s < 1024 THEN 4    WHEN gap_s < 4096 THEN 5
             WHEN gap_s < 16384 THEN 6   WHEN gap_s < 65536 THEN 7
             WHEN gap_s < 262144 THEN 8  ELSE 9
           END AS bucket,
           count(*) AS n,
           min(gap_s) AS min_gap_s,
           max(gap_s) AS max_gap_s
    FROM gaps
    WHERE gap_s IS NOT NULL
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Log-bucketed (base-4) inter-event-gap histogram per user "
    "sequence: same user_id window shuffle, integer-threshold buckets "
    "(exact parity — no floor(ln) ulp risk), 10-key rollup.",
    tags=("events", "sequence", "histogram"),
)
def inter_event_time_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    ev = load_events(spark, sf_dir).select(gap.alias("gap_s"))
    bucket = F.lit(9)
    for b in range(8, -1, -1):  # 4^(b+1) thresholds, innermost wins
        bucket = F.when(F.col("gap_s") < 4 ** (b + 1), b).otherwise(bucket)
    bucket = bucket.cast("bigint")
    return (
        ev.filter(F.col("gap_s").isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Market-basket co-occurrence ("bought X, also bought Y"): order-level
# basket self-join. The join is bounded per basket (≤ items-per-order
# pairs, a domain constant), never corpus² — the same per-group-bounded
# self-join discipline as word_cooccurrence_pmi; at PB scale cap basket
# size first. Counts are exact integers.
# --------------------------------------------------------------------------
@extra_query(
    "item_cooccurrence_topk",
    oracle="""
    WITH bp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
    FROM bp a JOIN bp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
    doc="Top co-purchased part pairs: order-level basket dedup, per-basket "
    "bounded self-join (cap basket size at PB scale), pair-key rollup.",
    tags=("join", "basket", "recommendation"),
)
def item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bp = li.select("l_orderkey", "l_partkey").distinct()
    a, b = bp.alias("a"), bp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Customer revenue deciles: per-customer revenue (rounded BEFORE ranking so
# both engines rank identical doubles; ties broken by custkey), ntile(10),
# then per-decile rollup. Two shuffles total: the revenue agg and the
# decile rollup; the ntile window is a single global sort over the
# already-aggregated customer frame (at PB scale: customer-cardinality,
# not corpus-cardinality).
# --------------------------------------------------------------------------
@extra_query(
    "customer_revenue_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, revenue,
             ntile(10) OVER (ORDER BY revenue, o_custkey) AS decile
      FROM rev
    )
    SELECT decile, count(*) AS n_customers,
           round(sum(revenue), 2) AS total_revenue,
           round(min(revenue), 2) AS min_revenue,
           round(max(revenue), 2) AS max_revenue
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
    doc="Customer spend deciles: rounded per-customer revenue, "
    "deterministic ntile(10) (tie-break custkey), per-decile stats.",
    tags=("agg", "window", "deciles"),
)
def customer_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    # distributed rank instead of a no-partition ntile window (which
    # funnels every customer through one partition at scale); the ntile
    # oracle cross-checks the bucket arithmetic
    from railgun_spark.operators.rank import ntile_from_rank, with_global_rank

    ranked_df, total = with_global_rank(rev, ["revenue", "o_custkey"])
    ranked = ranked_df.withColumn("decile", ntile_from_rank("__rank", 10, total))
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("total_revenue"),
            F.round(F.min("revenue"), 2).alias("min_revenue"),
            F.round(F.max("revenue"), 2).alias("max_revenue"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Funnel latency percentiles: HOW FAST users convert, not just whether
# (funnel_conversion counts). Per-user first-view -> first-click ->
# first-purchase chain (the funnel's strictly-ordered min-ts joins), then
# exact nearest-rank p25/p50/p75 of the latency per stage pair. Latencies
# are integer seconds (bigint microsecond difference DIV 1e6) so both
# engines rank identical values. The rank window partitions by stage (2
# keys) over the CONVERTED-USERS aggregate — user-cardinality rows, not
# events; same external-sort discipline as revenue_percentiles.
# --------------------------------------------------------------------------
@extra_query(
    "funnel_latency_percentiles",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, v.t1, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id, v.t1
    ), p AS (
      SELECT e.user_id, c.t1, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id, c.t1
    ), lat AS (
      SELECT 'view_to_click' AS stage,
             (epoch_us(t2) - epoch_us(t1)) // 1000000 AS secs FROM c
      UNION ALL
      SELECT 'view_to_purchase' AS stage,
             (epoch_us(t3) - epoch_us(t1)) // 1000000 AS secs FROM p
    ), ranked AS (
      SELECT stage, secs,
             row_number() OVER (PARTITION BY stage ORDER BY secs) AS rn
      FROM lat
    ), counts AS (
      SELECT stage, count(*) AS n FROM lat GROUP BY stage
    )
    SELECT r.stage, any_value(c.n) AS n_users,
           max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN secs END) AS p25_s,
           max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN secs END) AS p50_s,
           max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN secs END) AS p75_s
    FROM ranked r JOIN counts c USING (stage)
    GROUP BY r.stage
    ORDER BY r.stage
    """,
    doc="Exact nearest-rank latency percentiles for the view->click and "
    "view->purchase funnel legs: strictly-ordered min-ts chain, integer-"
    "second latencies, rank window over converted users only.",
    tags=("agg", "funnel", "events"),
)
def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t1", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t3"))
    )

    def secs(a, b):
        return ((F.unix_micros(F.col(b)) - F.unix_micros(F.col(a))) / F.lit(1_000_000)).cast("bigint")

    lat = c.select(F.lit("view_to_click").alias("stage"), secs("t1", "t2").alias("secs")).unionByName(
        p.select(F.lit("view_to_purchase").alias("stage"), secs("t1", "t3").alias("secs"))
    )
    counts = lat.groupBy("stage").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("stage").orderBy("secs")
    ranked = lat.withColumn("rn", F.row_number().over(w))

    def at_rank(alias: str, q: float):
        target = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("secs"))).alias(alias)

    return (
        ranked.join(F.broadcast(counts), "stage")
        .groupBy("stage")
        .agg(
            F.any_value(F.col("n")).alias("n_users"),
            at_rank("p25_s", 0.25),
            at_rank("p50_s", 0.50),
            at_rank("p75_s", 0.75),
        )
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# Join-key skew report — the measurement that decides salting / AQE skew
# handling at 100 TB. For a key column: row and key cardinalities, the
# heaviest key's share, top-10 keys' share, and the max/mean ratio. One
# groupBy(key) shuffle; every later stage runs over the KEY-cardinality
# aggregate (window over per-key counts, single-row rollup). Ratios
# rounded at 4 on both engines.
# --------------------------------------------------------------------------
@extra_query(
    "key_skew_report_events",
    oracle="""
    WITH per_key AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn FROM per_key
    ), tot AS (
      SELECT sum(c) AS n_rows, count(*) AS n_keys, max(c) AS max_c
      FROM per_key
    )
    SELECT t.n_rows::BIGINT AS n_rows, t.n_keys::BIGINT AS n_keys,
           t.max_c::BIGINT AS max_key_rows,
           round(t.max_c * 1.0 / t.n_rows, 4) AS max_key_share,
           round((SELECT sum(c) FROM ranked WHERE rn <= 10) * 1.0
                 / t.n_rows, 4) AS top10_share,
           round(t.max_c * 1.0 * t.n_keys / t.n_rows, 4) AS skew_ratio
    FROM tot t
    """,
    doc="Join-key skew profile for events.user_id: heaviest-key and top-10 "
    "shares plus max/mean ratio — the salting/AQE decision input. One "
    "groupBy(key) shuffle; windows run over per-key counts only.",
    tags=("agg", "ops", "events"),
)
def key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    # top-10 heaviest keys via sort|limit (distributed TakeOrdered) — a
    # no-partition row_number window here would funnel EVERY key through
    # one partition, and key cardinality scales with the corpus
    top10 = (
        per_key.orderBy(F.desc("c"), "user_id")
        .limit(10)
        .agg(F.sum("c").alias("top10_rows"))
    )
    stats = per_key.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_key_rows"),
    )
    return stats.crossJoin(F.broadcast(top10)).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round(F.col("max_key_rows") * F.lit(1.0) / F.col("n_rows"), 4).alias(
            "max_key_share"
        ),
        F.round(F.col("top10_rows") * F.lit(1.0) / F.col("n_rows"), 4).alias(
            "top10_share"
        ),
        F.round(
            F.col("max_key_rows") * F.lit(1.0) * F.col("n_keys") / F.col("n_rows"), 4
        ).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# Repeat-purchase cadence: per-customer gaps between consecutive orders
# (lag window PARTITIONED by customer — never global), summarized as
# exact nearest-rank percentiles of the gap-in-days distribution. The
# distribution aggregate is gap-count-sized; the only corpus-scale
# shuffle is the per-customer window partition.
# --------------------------------------------------------------------------
@extra_query(
    "repeat_purchase_interval",
    oracle="""
    WITH gaps AS (
      SELECT date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL),
    ranked AS (
      SELECT gap_days, row_number() OVER (ORDER BY gap_days) AS rn,
             count(*) OVER () AS n
      FROM g
    )
    SELECT count(*)::BIGINT AS n_gaps,
           max(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.50) AS BIGINT))
                    THEN gap_days END) AS p50_days,
           max(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.90) AS BIGINT))
                    THEN gap_days END) AS p90_days,
           max(gap_days) AS max_days
    FROM ranked
    """,
    doc="Per-customer consecutive-order gaps (customer-partitioned lag) "
    "-> exact nearest-rank p50/p90/max of the gap distribution; the "
    "global rank runs over gap VALUES via sort|rank on a count-bounded "
    "frame.",
    tags=("analytics", "window", "events"),
)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("__prev", F.lag("o_orderdate").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.datediff("o_orderdate", "__prev").alias("gap_days"))
    )
    # exact nearest-rank percentiles: distinct-value frequencies (bounded
    # by the day-gap value space) + cumulative counts — no global
    # row_number over all gaps
    freq = gaps.groupBy("gap_days").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("gap_days").rowsBetween(Window.unboundedPreceding, 0)
    cum = freq.withColumn("cum", F.sum("c").over(wv))
    total = gaps.count()

    def pick(q):
        import math

        # smallest value whose cumulative count reaches ceil(n*q)
        rank = max(1, math.ceil(total * q))
        return F.min(F.when(F.col("cum") >= rank, F.col("gap_days")))

    return cum.agg(
        F.lit(total).alias("n_gaps"),
        pick(0.50).alias("p50_days"),
        pick(0.90).alias("p90_days"),
        F.max("gap_days").alias("max_days"),
    )


# --------------------------------------------------------------------------
# Supplier concentration (HHI): per-nation Herfindahl index of supplier
# revenue shares — the procurement-risk metric. Two aggregates: revenue
# per (nation, supplier), then sum of squared shares per nation; the
# nation dim broadcasts.
# --------------------------------------------------------------------------
@extra_query(
    "supplier_concentration_hhi",
    oracle="""
    WITH sup_rev AS (
      SELECT n_name, s_suppkey,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT n_name, sum(rev) AS trev, count(*) AS n_suppliers FROM sup_rev GROUP BY 1
    )
    SELECT s.n_name, t.n_suppliers::BIGINT AS n_suppliers,
           round(sum((s.rev / t.trev) * (s.rev / t.trev)), 6) AS hhi
    FROM sup_rev s JOIN tot t USING (n_name)
    GROUP BY s.n_name, t.n_suppliers
    ORDER BY s.n_name
    """,
    doc="Per-nation Herfindahl index of supplier revenue shares: one "
    "(nation, supplier) aggregate, one nation-level share-square sum; "
    "broadcast nation dim, suppkey shuffle only.",
    tags=("analytics", "agg", "join"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    sup_rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    tot = sup_rev.groupBy("n_name").agg(
        F.sum("rev").alias("trev"), F.count(F.lit(1)).alias("n_suppliers")
    )
    share = F.col("rev") / F.col("trev")
    return (
        sup_rev.join(tot, "n_name")
        .groupBy("n_name", "n_suppliers")
        .agg(F.round(F.sum(share * share), 6).alias("hhi"))
        .orderBy("n_name")
    )
