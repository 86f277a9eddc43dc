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

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from railgun_spark.operators.dedup import (
    CONTAM_THRESHOLD,
    EVAL_MOD,
    shingles_of_words,
    words,
)


def eval_shingle_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static side: distinct trigram shingles of the eval set (tiny)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        # word-count form of the non-empty filter (>= 3 words <=> >= 1
        # shingle): the pushed-down size(sh) form re-evaluates the whole
        # interpreted shingle chain per row (see _docs_with_shingles)
        .filter(F.size(words(F.col("text"))) >= 3)
        # two-stage tokenize->shingle: regexp once per row (dedup.py)
        .select(words(F.col("text")).alias("__ws"))
        .select(shingles_of_words(F.col("__ws")).alias("sh"))
        .select(F.explode("sh").alias("g"))
        .distinct()
    )


def flag_contaminated_batch(batch_df: DataFrame, ev: DataFrame) -> DataFrame:
    """The per-batch join: identical semantics to the batch operator."""
    s = (
        batch_df.filter(
            (F.col("doc_id") % EVAL_MOD != 0)
            & (F.size(words(F.col("text"))) >= 3)
        )
        .select("doc_id", words(F.col("text")).alias("__ws"))
        .select("doc_id", shingles_of_words(F.col("__ws")).alias("sh"))
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


def _refuse_fresh_checkpoint_over_used_sink(checkpoint_dir: str, flags_sink: str) -> None:
    """Per-batch overwrite is idempotent only while the batch-id -> files
    mapping is stable, i.e. within ONE checkpoint lineage. A FRESH
    checkpoint may batch the files differently and strand the old run's
    higher-numbered partitions as phantom flags — refuse loudly."""
    import os

    if not os.path.exists(checkpoint_dir) and os.path.exists(flags_sink):
        if any(not e.startswith((".", "_")) for e in os.listdir(flags_sink)):
            raise ValueError(
                f"flags_sink {flags_sink!r} already holds partitions but "
                f"checkpoint_dir {checkpoint_dir!r} is fresh: a new "
                "checkpoint may assign different batch ids and strand the "
                "old run's partitions as phantom flags. Resume with the "
                "original checkpoint, or point the fresh run at an empty "
                "sink."
            )


def stream_decontaminate_availablenow(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str,
    checkpoint_dir: str,
    flags_sink: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Run document shards landing in `source_dir` through the streaming
    path to completion (availableNow) and return the flagged docs as a
    DataFrame ``(doc_id, ingest_batch)`` read from `flags_sink` — the
    batch-twin harness used by tests to prove stream/batch equivalence.
    (File stream sources take a directory of arriving shards; the eval set
    and schema come from the pinned sf_dir table.)

    Flags are WRITTEN, not collected: on a contaminated slice of a 100 TB
    corpus the flag set is itself big data, so each micro-batch overwrites
    its own ``ingest_batch=<id>`` partition of the parquet sink (the same
    replay-idempotent discipline as ingest.py `_write_sink`) and the
    driver never holds a row. A crash-replayed batch recomputes identical
    flags (the join has no cross-batch state) and overwrites the same
    partition, so restarts never duplicate or lose flags."""
    _refuse_fresh_checkpoint_over_used_sink(checkpoint_dir, flags_sink)
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

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # empty batches still write their (empty) partition: idempotent
        # either way, and the sink then records that the batch was examined
        flag_contaminated_batch(batch_df, ev).write.mode("overwrite").parquet(
            f"{flags_sink}/ingest_batch={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.option("basePath", flags_sink).parquet(flags_sink)
    except AnalysisException as e:
        # zero micro-batches ran (empty source dir): no sink was created.
        # ONLY that case maps to empty — an unreadable/corrupt sink must
        # raise, not silently report zero contamination (same discipline
        # as dedup._read_index_or_none).
        from railgun_spark.errors import is_path_not_found

        if is_path_not_found(e):
            return spark.createDataFrame([], "doc_id BIGINT, ingest_batch INT")
        raise


def stream_neardup_decontaminate_availablenow(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str,
    checkpoint_dir: str,
    flags_sink: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming twin of decontaminate_neardup_eval (operators/dedup.py):
    each arriving shard's training docs run the lossless cross-table
    prefix-filter join against the pinned eval set, and every doc within
    Jaccard >= NEARDUP_CONTAM threshold of some eval doc is flagged with
    its best-matching eval doc — per-item leak attribution at ingest
    time, not a pooled-shingle score.

    Per-batch semantics are complete (the eval side is static and each
    doc lives in exactly one micro-batch), so the per-batch best match
    equals the batch operator's global best match — the batch-twin test
    asserts the exact (doc_id, eval_doc_id, jaccard) set. Flags land in
    the replay-idempotent ``ingest_batch=<id>`` partition layout; the
    driver never holds a flag row."""
    from railgun_spark.operators.dedup import (
        NEARDUP_CONTAM_DEN,
        NEARDUP_CONTAM_NUM,
        jaccard_similarity_join_ab,
    )
    from pyspark.sql.window import Window

    _refuse_fresh_checkpoint_over_used_sink(checkpoint_dir, flags_sink)
    static_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # pinned eval side: hashed shingle sets, materialized once
    ev = (
        static_docs.filter(
            (F.col("doc_id") % EVAL_MOD == 0)
            & (F.size(words(F.col("text"))) >= 3)
        )
        .select("doc_id", words(F.col("text")).alias("__ws"))
        .select(
            "doc_id",
            F.transform(shingles_of_words(F.col("__ws")), lambda g: F.xxhash64(g)).alias("sh"),
        )
        .localCheckpoint()
    )
    stream = (
        spark.readStream.schema(static_docs.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        tr = (
            batch_df.filter(
                (F.col("doc_id") % EVAL_MOD != 0)
                & (F.size(words(F.col("text"))) >= 3)
            )
            .select("doc_id", words(F.col("text")).alias("__ws"))
            .select(
                "doc_id",
                F.transform(shingles_of_words(F.col("__ws")), lambda g: F.xxhash64(g)).alias("sh"),
            )
        )
        pairs = jaccard_similarity_join_ab(
            tr, ev, "doc_id", "sh", NEARDUP_CONTAM_NUM, NEARDUP_CONTAM_DEN
        )
        best = Window.partitionBy("id_left").orderBy(F.desc("jaccard"), "id_right")
        flags = (
            pairs.withColumn("__rn", F.row_number().over(best))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("id_left").alias("doc_id"),
                F.col("id_right").alias("eval_doc_id"),
                F.round("jaccard", 4).alias("jaccard"),
            )
        )
        flags.write.mode("overwrite").parquet(f"{flags_sink}/ingest_batch={batch_id}")

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.option("basePath", flags_sink).parquet(flags_sink)
    except AnalysisException as e:
        from railgun_spark.errors import is_path_not_found

        if is_path_not_found(e):
            return spark.createDataFrame(
                [], "doc_id BIGINT, eval_doc_id BIGINT, jaccard DOUBLE, ingest_batch INT"
            )
        raise
