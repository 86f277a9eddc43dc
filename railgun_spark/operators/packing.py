"""Sequence packing: assign documents to fixed-token-budget training bins.

LLM pretraining consumes fixed-length sequences; packing multiple short
documents into one sequence (instead of padding) is the standard
throughput lever. Bin assignment is inherently sequential WITHIN a bin
stream, so the scale shape is: an EXPLICIT deterministic bucket key
(content-hash mod P — not Spark's sampled range partitioner, whose
boundaries vary with input partitioning), then independent greedy packing
inside each bucket via applyInPandas (one Arrow batch per bucket, Python
only at the bucket granularity). Results are a pure function of the data:
same corpus -> same bins, regardless of how the input was partitioned —
the property samplers and resumable training jobs need.

Choose P ~ corpus_tokens / (bins_per_bucket * max_tokens) so each bucket
holds a bounded slice; buckets pack in parallel across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from railgun_spark.operators.text import bpe_token_estimate, hash60
from railgun_spark.suite import extra_query

PACK_SCHEMA = "doc_id long, n_tokens long, bucket long, bin_id string"


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, bucket, bin_id) with sum(n_tokens) <= max_tokens
    per bin. Docs longer than max_tokens are dropped (callers chunk them
    upstream); next-fit over hash-ordered docs keeps packing O(n) and
    deterministic (tie-break doc_id)."""
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            bpe_token_estimate(F.col(text_col)).cast("long").alias("n_tokens"),
            hash60(F.col(text_col)).alias("hk"),
        )
        .filter(F.col("n_tokens") <= max_tokens)
        .withColumn("bucket", F.pmod(F.col("hk"), F.lit(n_buckets)))
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["hk", "doc_id"]).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        bins, sums = [], 0
        cur = -1
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if cur < 0 or sums + nt > max_tokens:
                cur += 1
                sums = 0
            sums += nt
            bins.append(f"{bucket}-{cur}")
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "bucket": pdf["bucket"],
                "bin_id": bins,
            }
        )

    return base.groupBy("bucket").applyInPandas(_pack, PACK_SCHEMA)


# --------------------------------------------------------------------------
# Document chunking — the upstream mate of pack_sequences (which DROPS
# docs over budget; chunking is the canonical fix). Entirely map-side:
# token split, index-sequence transform, slice+join, posexplode — no
# shuffle at all, so it composes into any pipeline for free. Whitespace is
# normalized to single spaces inside chunks (documented contract).
# --------------------------------------------------------------------------
def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text); empty docs yield
    no chunks. Integer arithmetic only (ceil via (n+c-1) div c).

    Two-stage tokenize -> chunk (r18, same discipline as the dedup
    shingle passes): the chunk generator references the token array in
    the sequence bound and the slice, so an inlined regexp tokenizer
    would run 3x per row (filter + two generator references); projecting
    the array first makes it one regexp per row. n_chunk_tokens is the
    exact slice length min(c, n - idx*c) — \\S+ tokens are non-empty and
    whitespace-free, so re-tokenizing the joined chunk text would count
    exactly the slice elements back."""
    c = chunk_tokens
    ws_col = F.col("__ws")
    n = F.size(ws_col)
    n_chunks = ((n + c - 1) / c).cast("long")  # exact: ints divide then cast
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(F.slice(ws_col, i * c + 1, c), " "),
    )
    ws_in = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    return (
        df.filter(F.size(ws_in) > 0)
        .select(
            F.col(id_col).alias("doc_id"), ws_in.alias("__ws")
        )
        .select("doc_id", F.size(ws_col).alias("__n"), F.posexplode(chunks))
        .select(
            "doc_id",
            F.col("pos").alias("chunk_idx"),
            F.least(F.lit(c), F.col("__n") - F.col("pos") * c).alias(
                "n_chunk_tokens"
            ),
            F.col("col").alias("chunk_text"),
        )
    )


CHUNK_TOKENS = 10


@extra_query(
    "document_chunking",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws
      FROM documents WHERE doc_id < 30
    ), c AS (
      SELECT doc_id,
             list_transform(
               range(0, (len(ws) + {CHUNK_TOKENS - 1}) // {CHUNK_TOKENS}),
               i -> array_to_string(
                 ws[i*{CHUNK_TOKENS}+1 : i*{CHUNK_TOKENS}+{CHUNK_TOKENS}], ' '))
               AS chunks
      FROM t WHERE len(ws) > 0
    ), u AS (
      SELECT doc_id,
             generate_subscripts(chunks, 1) - 1 AS chunk_idx,
             unnest(chunks) AS chunk
      FROM c
    )
    SELECT doc_id, chunk_idx,
           len(regexp_extract_all(chunk, '\\S+')) AS n_chunk_tokens,
           CAST(('0x' || substr(md5(chunk), 1, 15)) AS UBIGINT)::BIGINT
             AS chunk_hash
    FROM u
    ORDER BY doc_id, chunk_idx
    """,
    doc=f"Map-side doc chunking into <={CHUNK_TOKENS}-token pieces: token "
    "split + index transform + slice/join + posexplode, zero shuffle; "
    "chunk content certified cross-engine by the shared 60-bit hash.",
    tags=("text", "chunking"),
)
def document_chunking(spark, sf_dir: str) -> DataFrame:
    from railgun_spark.operators.text import hash60

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 30)
    )
    return (
        chunk_documents(docs, CHUNK_TOKENS)
        .select(
            "doc_id",
            "chunk_idx",
            "n_chunk_tokens",
            hash60(F.col("chunk_text")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )
