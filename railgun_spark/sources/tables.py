"""Loaders for the driver's parquet tables.

`events.parquet` is written with TIMESTAMP(NANOS) which the Spark parquet
reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it with the
`nanosAsLong` legacy conf (runtime-settable) and convert to a proper
TimestampType by integer-dividing to microseconds — truncation, matching
DuckDB's ns->us behavior when fetching, so oracle values agree.
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
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
