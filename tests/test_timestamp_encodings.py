"""Regression guard for driver writer timestamp-encoding shifts.

The driver's testdata writer has changed encodings across rounds
(TIMESTAMP(NANOS) -> pandas/pyarrow timestamp[us] with isAdjustedToUTC=false,
i.e. TIMESTAMP_NTZ to Spark 4). Each shift broke every event-time operator at
once (unix_micros, withWatermark). These tests pin `load_events` to return a
plain TimestampType for every encoding we've seen, so the next writer shift
fails ONE targeted test instead of six suites plus the bench harness.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from railgun_spark.sources.tables import load_events


def _rows():
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    return {
        "event_id": [1, 2, 3],
        "ts": [base, base + datetime.timedelta(minutes=5), base + datetime.timedelta(hours=2)],
        "user_id": [10, 10, 11],
    }


def _write(tmp_path, ts_type) -> str:
    rows = _rows()
    table = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], ts_type),
            "user_id": pa.array(rows["user_id"], pa.int64()),
        }
    )
    out = tmp_path / "events.parquet"
    pq.write_table(table, str(out))
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type,infer_ntz",
    [
        (pa.timestamp("us"), False),  # engine policy: NTZ inference off
        (pa.timestamp("us"), True),  # foreign session: cast branch must fire
        (pa.timestamp("us", tz="UTC"), False),  # isAdjustedToUTC=true
        (pa.timestamp("ns"), False),  # TIMESTAMP(NANOS) -> nanosAsLong path
    ],
    ids=["ntz_us_policy", "ntz_us_cast_branch", "utc_us", "nanos"],
)
def test_load_events_normalizes_to_timestamp(spark, tmp_path, ts_type, infer_ntz):
    conf_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, str(infer_ntz).lower())
    try:
        df = load_events(spark, _write(tmp_path, ts_type))
    finally:
        spark.conf.set(conf_key, prior)
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.dtypes
    # The operators that broke must analyze cleanly on the loaded frame.
    df.select(F.unix_micros("ts").alias("us")).collect()
    # Wall-clock values must be preserved (session tz pinned UTC).
    got = sorted(r.us for r in df.select(F.unix_micros("ts").alias("us")).collect())
    base = int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert got == [base, base + 300 * 1_000_000, base + 7200 * 1_000_000]


def test_load_events_supports_watermark(spark, tmp_path):
    sf_dir = _write(tmp_path, pa.timestamp("us"))
    df = load_events(spark, sf_dir)
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE raises at analysis if ts were NTZ.
    df.withWatermark("ts", "10 minutes").groupBy(
        F.window("ts", "1 hour")
    ).count().collect()
