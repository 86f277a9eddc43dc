"""Streaming decontamination: stream-static join inside foreachBatch.

The batch operator (`operators/dedup.py decontaminate_ngram_overlap`)
broadcasts the eval-set shingles and joins the corpus against them. The
streaming form is the same join run per micro-batch via foreachBatch —
the idiomatic Structured Streaming pattern when each unit of work (a
document) is fully contained in one input row: no streaming aggregation
state is needed, because the groupBy(doc_id) inside the handler is plain
batch semantics over that micro-batch only. The static eval side is
computed once and broadcast to every batch.

At scale this is how an ingest pipeline keeps new crawl shards clean:
files land, each micro-batch flags contaminated docs against the pinned
benchmark set, clean rows flow to the corpus sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from railgun_spark.operators.dedup import (
    CONTAM_THRESHOLD,
    EVAL_MOD,
    shingles,
)


def eval_shingle_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static side: distinct trigram shingles of the eval set (tiny)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(shingles(F.col("text")).alias("sh"))
        .filter(F.size("sh") > 0)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )


def flag_contaminated_batch(batch_df: DataFrame, ev: DataFrame) -> DataFrame:
    """The per-batch join: identical semantics to the batch operator."""
    s = (
        batch_df.filter(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id", shingles(F.col("text")).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    tr = s.select("doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("g"))
    hits = (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return hits.filter(
        F.col("n_overlap") / F.col("n_shingles") >= CONTAM_THRESHOLD
    ).select("doc_id")


def stream_decontaminate_availablenow(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> list[int]:
    """Run document shards landing in `source_dir` through the streaming
    path to completion (availableNow) and return the flagged doc_ids — the
    batch-twin harness used by tests to prove stream/batch equivalence.
    (File stream sources take a directory of arriving shards; the eval set
    and schema come from the pinned sf_dir table.)"""
    static_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # materialize the eval side ONCE: without this, every micro-batch
    # re-executes the whole scan/shingle/explode/distinct subtree before
    # broadcasting — "computed once" must mean the work, not just the plan
    ev = eval_shingle_set(spark, sf_dir).localCheckpoint()
    stream = (
        spark.readStream.schema(static_docs.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    # keyed by batch_id: a crash-replayed batch OVERWRITES its own entry
    # instead of appending duplicates (same replay window ingest.py closes)
    flagged_by_batch: dict[int, list[int]] = {}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        flagged_by_batch[batch_id] = [
            r["doc_id"] for r in flag_contaminated_batch(batch_df, ev).collect()
        ]

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(d for ids in flagged_by_batch.values() for d in ids)
