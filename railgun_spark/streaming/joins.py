"""Stream-stream interval join with watermark-bounded state.

The last Structured Streaming pattern in the matrix (windows, session
windows, stateful ops, foreachBatch ingest/decontam are covered
elsewhere): two unbounded inputs joined on an equality key plus an
event-time interval. Spark buffers each side in the state store; the
watermarks plus the time-range predicate are what make that state
FINITE — each side can discard rows older than (other side's watermark −
interval), so state is O(rate × interval), not O(stream length). Without
the time bound a stream-stream inner join is an error in Spark precisely
because state would grow forever — the interval predicate isn't an
optimization here, it's the semantics that make the join executable.

The logic is written once as `correlate_actions`; batch execution gives
the DuckDB-checkable twin, `stream_correlated_actions` runs the same
plan on two readStream sources (tested availableNow, equal results).

At 100 TB-rate: the join keys shuffle both sides; skewed users are split
by AQE in batch, and in streaming the state store partitions by the same
key — a hot user bounds one partition's state, which the interval keeps
capped. The 15-minute interval at the test data's event rate keeps the
per-trigger state in the low MBs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from railgun_spark.sources.tables import load_events
from railgun_spark.suite import extra_query

INTERVAL_MIN = 15


def correlate_actions(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Purchases within [0, INTERVAL_MIN] minutes AFTER a click by the same
    user: (user_id, click_id, purchase_id, lag_sec). The one-sided interval
    is the attribution-window shape (click precedes conversion)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {INTERVAL_MIN} MINUTES"))
    )
    # integer microseconds end-to-end: unix_timestamp would FLOOR each
    # timestamp to seconds before subtracting (off-by-one vs the oracle's
    # fractional epoch difference on sub-second data)
    lag = (F.unix_micros("p_ts") - F.unix_micros("c_ts")) / F.lit(1_000_000)
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.floor(lag).cast("bigint").alias("lag_sec"),
    )


def _split_events(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The test corpus has one event stream; 'click' and 'purchase' are its
    two busiest types."""
    return (
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@extra_query(
    "stream_interval_join_attribution",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id AS user_id, click_id, purchase_id,
           (epoch_us(p_ts) - epoch_us(c_ts)) // 1000000 AS lag_sec
    FROM c JOIN p ON c.user_id = p.user_id
              AND p_ts >= c_ts
              AND p_ts <= c_ts + INTERVAL {INTERVAL_MIN} MINUTES
    ORDER BY c.user_id, click_id, purchase_id
    """,
    doc="Click->purchase attribution interval join: the batch twin of the "
    "watermarked stream-stream join (streaming/joins.py). Equality key "
    "shuffles both sides; the time predicate bounds streaming state to "
    "O(rate x interval).",
    tags=("streaming", "join"),
)
def stream_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, purchases = _split_events(load_events(spark, sf_dir))
    return correlate_actions(clicks, purchases).orderBy(
        "user_id", "click_id", "purchase_id"
    )


def stream_correlated_actions(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "1 hour",
) -> DataFrame:
    """The same join over two readStream views of the event shards, each
    watermarked; returns the availableNow-drained result (memory sink).
    Watermarks allow Spark to expire buffered click state once the purchase
    side's clock passes click_ts + interval + watermark (and vice versa)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    clicks, purchases = _split_events(stream)
    joined = correlate_actions(
        clicks.withWatermark("ts", watermark),
        purchases.withWatermark("ts", watermark),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("corr_actions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("corr_actions")
