"""Event-time windowed aggregation over the `events` table.

The reference's --stream flag is bounded line-pipelining through Go channels
(cli/process.go:795-851) with no watermarks/windows; Structured Streaming is
our superset (SURVEY §2.10). The window logic below is written once and runs
identically as a batch DataFrame (oracle-checkable) or on `readStream`
(`stream_windowed_counts`), which is how Spark is meant to be used: same
logical plan, micro-batch physical execution.

Scale: windowed groupBy keys are (window, event_type) — bounded cardinality
per trigger; the watermark bounds state store size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from railgun_spark.sources.tables import load_events
from railgun_spark.suite import extra_query, query


def windowed_counts(df: DataFrame, window: str = "1 day") -> DataFrame:
    """Tumbling-window counts/sums by event_type (epoch-aligned windows,
    equivalent to DuckDB time_bucket)."""
    return (
        df.groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@extra_query(
    "tumbling_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY win_start, event_type
    ORDER BY win_start, event_type
    """,
    doc="Tumbling event-time window == epoch-aligned time_bucket in batch.",
    tags=("streaming", "window"),
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return windowed_counts(ev, "1 day").orderBy("win_start", "event_type")


@extra_query(
    "sliding_window_active_users",
    oracle="""
    WITH wins AS (
      SELECT DISTINCT user_id,
             time_bucket(INTERVAL '6 hours', ts - to_hours(h.range * 6)) AS win_start
      FROM events, range(2) h
      WHERE ts - to_hours(h.range * 6) >= TIMESTAMP '2024-01-01 00:00:00'
    )
    SELECT win_start, count(DISTINCT user_id) AS active_users
    FROM wins
    WHERE win_start >= TIMESTAMP '2024-01-01 00:00:00'
    GROUP BY win_start
    ORDER BY win_start
    """,
    doc="Sliding window (12h window, 6h slide): each event lands in 2 "
    "buckets; distinct-user count per window start.",
    tags=("streaming", "window"),
)
def sliding_window_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    lower = F.lit("2024-01-01 00:00:00").cast("timestamp")
    return (
        ev.groupBy(F.window("ts", "12 hours", "6 hours").alias("win"), F.col("user_id"))
        .count()
        .select(F.col("win.start").alias("win_start"), "user_id")
        .filter(F.col("win_start") >= lower)
        .groupBy("win_start")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("win_start")
    )


def stream_windowed_counts(
    spark: SparkSession, source_dir: str, schema, window: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """True streaming twin: file-source readStream with a watermark bounding
    late data (and state). Same aggregation as `windowed_counts`."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return windowed_counts(stream.withWatermark("ts", watermark), window)


# --------------------------------------------------------------------------
# Native session windows (F.session_window): gap-merged sessions as ONE
# groupBy — the streaming-ready twin of operators/relational2.sessionize_
# events (lag + cumulative sum). Semantics note: session_window closes at
# start + gap, so a gap of exactly 30min starts a NEW session (>=), while
# the lag formulation uses strict >; the oracle mirrors >= here.
# --------------------------------------------------------------------------
SESSION_WINDOW_GAP_MIN = 30


@query(
    "session_window_counts",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '{SESSION_WINDOW_GAP_MIN} minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             -- same (ts, event_id) tiebreak as the marked window: without
             -- it, duplicate (user_id, ts) rows could order either way and
             -- attach an event to the wrong session nondeterministically
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc=f"Native session_window('{SESSION_WINDOW_GAP_MIN} minutes'): "
    "gap-merged sessions in one shuffle on user_id; the identical plan "
    "runs on readStream with a watermark (state = open sessions only).",
    tags=("streaming", "window"),
)
def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_WINDOW_GAP_MIN} minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .orderBy("user_id", "session_start")
    )
