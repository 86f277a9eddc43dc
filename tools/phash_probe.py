"""Candidate/true-pair scaling probe for the perceptual-hash band
geometries (r13 VERDICT #2 deliverable).

Synthesizes N-hash populations with PLANTED near-dups (one per 8 rows:
id % 8 == 1 is a 1-bit-per-word perturbation of id - 1; all other rows
are independent md5-derived hashes) and, at x1/x8/x16/x32 blow-ups,
counts

  candidates = distinct (id_a, id_b) pairs sharing ANY band key
               (the join's pre-verify output — what an executor pays)
  true_pairs = candidates surviving the verified hamming budget

for three geometries:

  narrow_4x16  — 4 bands x 16-bit keys over the 64-bit dHash
                 (the default gate geometry; budget <= 3)
  wide_16x16   — 16 bands x 16-bit keys over the 256-bit block dHash
                 (budget <= 15; keys still saturate)
  coarse_8x32  — 8 bands x 32-bit keys over the same 256 bits
                 (budget <= 7; the candidate-headroom geometry)

Expected shape (the claim the JSON must show): 16-bit-key candidate
counts grow ~ B*N^2/2^16 once N passes the key space, while 32-bit-key
candidates track the planted pair count. No decode — this probes the
join algebra; hashes are generated as Columns.

Usage: python tools/phash_probe.py [--base 20000] [--factors 1,8,16,32]
       [--out PHASH_CANDIDATE_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _md5_60(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def synth_hashes(spark: SparkSession, n: int) -> DataFrame:
    """(media_id, dhash, h0..h3): id % 8 == 1 rows are 1-bit-per-word
    variants of id - 1; everything else is independent."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.expr("id - CASE WHEN id % 8 = 1 THEN 1 ELSE 0 END").alias("gid"),
        (F.col("id") % 8 == 1).alias("is_var"),
    )
    flip = "shiftleft(CAST(1 AS BIGINT), CAST(gid % 60 AS INT))"
    cols = [
        F.expr(
            f"CASE WHEN is_var THEN {_md5_60('CAST(gid AS STRING)')} ^ {flip} "
            f"ELSE {_md5_60('CAST(gid AS STRING)')} END"
        ).alias("dhash")
    ]
    for w in range(4):
        base = _md5_60(f"concat(CAST(gid AS STRING), ':w{w}')")
        cols.append(
            F.expr(
                f"CASE WHEN is_var THEN {base} ^ {flip} ELSE {base} END"
            ).alias(f"h{w}")
        )
    return df.select("media_id", *cols)


def count_candidates(
    hashes: DataFrame, chunks_col, hamming_col, budget: int
) -> tuple[int, int]:
    """(distinct candidate pairs, verified true pairs) for one banding."""
    ex = hashes.select(
        F.col("media_id").alias("__id"),
        *[c for c in hashes.columns if c != "media_id"],
        F.posexplode(chunks_col).alias("ci", "cv"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select("a.__id", "b.__id", hamming_col.alias("__ham"))
        .groupBy("a.__id", "b.__id")
        .agg(F.min("__ham").alias("__ham"))
    )
    # one job, no materialization: the x32 narrow/wide cells emit 10^8
    # candidate rows — they must stream through the shuffle, not pin memory
    row = pairs.agg(
        F.count(F.lit(1)).alias("cand"),
        F.sum((F.col("__ham") <= budget).cast("long")).alias("true"),
    ).first()
    return int(row["cand"]), int(row["true"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=20000)
    ap.add_argument("--factors", default="1,8,16,32")
    ap.add_argument("--out", default="PHASH_CANDIDATE_PROBE.json")
    args = ap.parse_args()

    from railgun_spark.operators.phash import phash_chunks, phash_wide_chunks
    from railgun_spark.session import get_spark

    spark = get_spark("phash_probe")

    def narrow(h):
        ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
        return count_candidates(h, phash_chunks(F.col("dhash")), ham, 3)

    def wide(h, n_bands, budget):
        ham = F.lit(0)
        for w in range(4):
            ham = ham + F.bit_count(
                F.col(f"a.h{w}").bitwiseXOR(F.col(f"b.h{w}"))
            )
        cols = [F.col(f"h{w}") for w in range(4)]
        return count_candidates(h, phash_wide_chunks(cols, n_bands), ham, budget)

    geoms = {
        "narrow_4x16": narrow,
        "wide_16x16": lambda h: wide(h, 16, 15),
        "coarse_8x32": lambda h: wide(h, 8, 7),
    }
    factors = [int(x) for x in args.factors.split(",")]
    results: dict[str, list] = {g: [] for g in geoms}
    for f in factors:
        n = args.base * f
        hashes = synth_hashes(spark, n).localCheckpoint()
        for g, fn in geoms.items():
            t0 = time.time()
            cand, true = fn(hashes)
            sec = round(time.time() - t0, 2)
            row = {
                "n": n,
                "candidates": cand,
                "true_pairs": true,
                "cand_per_true": round(cand / max(true, 1), 2),
                "cand_over_n2": round(cand / (n * (n - 1) / 2), 10),
                "sec": sec,
            }
            results[g].append(row)
            print(g, row, flush=True)

    out = {"probe": "phash_candidates", "base": args.base,
           "factors": factors, "geometries": results}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"probe": "phash_candidates", "out": args.out}))


if __name__ == "__main__":
    main()
