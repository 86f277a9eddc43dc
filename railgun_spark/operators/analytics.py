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
