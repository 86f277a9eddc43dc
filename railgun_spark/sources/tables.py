"""Loaders for the driver's parquet tables.

`events.parquet` has shipped with two timestamp encodings across driver
regenerations, and `load_events` normalizes both to a plain TimestampType:

- TIMESTAMP(NANOS): the Spark parquet reader rejects it
  ([PARQUET_TYPE_ILLEGAL]); we read it with the `nanosAsLong` legacy conf
  (runtime-settable) and integer-divide to microseconds — truncation,
  matching DuckDB's ns->us behavior when fetching, so oracle values agree.
- timestamp[us] with isAdjustedToUTC=false (pandas/pyarrow default): Spark 4
  infers TIMESTAMP_NTZ, which `unix_micros`/`withWatermark` reject.
  Sessions built by `session.get_spark` disable NTZ inference engine-wide
  (a deliberate, documented policy set at build time — not mutated here,
  so unrelated reads in foreign sessions keep their own semantics); for
  sessions without that conf the cast branch below normalizes the column.
  The session timezone is pinned UTC (session.py), so wall-clock values
  are identical to what the DuckDB oracle sees.

The `nanosAsLong` conf IS set at runtime: without it the nanos-encoded
file cannot be read at all ([PARQUET_TYPE_ILLEGAL]), so there is no
schema-ambiguity hazard — only failure vs. success.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
