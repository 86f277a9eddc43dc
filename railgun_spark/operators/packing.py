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
