"""Candidate/true scaling probe for the OFFSET-mode video/audio join
(r14 VERDICT worklist #3).

The offset gates join on the frame-stripped chunk key (ci, cv) —
strictly less key entropy than the aligned gates' (frame_idx, ci, cv) —
so their random-collision candidate term grows ~ B*N_frames^2 / 2^16
while the aligned term divides further by the frame-position space.
This probe measures both on the same planted population so the entropy
loss is a number, not an argument. The chunked audio gate reuses the
video vote verbatim (phash.py modality parameter), so one probe covers
both modalities.

Population: V videos x 10 frames; every v % 8 == 1 is a TRIMMED copy of
v-1 (its frames 0..7 equal the base's 2..9 at a constant offset of 2)
with a 1-bit perturbation per frame; all other frames independent
md5-derived 60-bit hashes. Per size:

  candidates = distinct (id_a, id_b, frame_offset, fi) rows after the
               chunk equi-join (the rows the per-offset vote must group
               — what an executor pays)
  true       = (id_a, id_b, frame_offset) triples clearing the
               VIDEO_MATCH_FRAC vote at verified hamming <= 3

for three joins:
  offset_4x16  — (ci, cv) 16-bit chunk keys (the shipping offset mode)
  offset_2x32  — (ci2, cv2) 32-bit coarse chunk keys (lossless only for
                 per-frame hamming <= 1 — the candidate-headroom
                 geometry, same trade as the image side's 8x32)
  aligned_4x16 — (frame_idx, ci, cv) (the default gate, for reference)

Usage: python tools/phash_offset_probe.py [--videos 500,4000,8000,16000]
       [--out PHASH_OFFSET_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

FRAMES = 10
TRIM_OFFSET = 2


def synth_frames(spark: SparkSession, n_videos: int) -> DataFrame:
    """(media_id, frame_idx, fhash): v % 8 == 1 videos are trimmed
    1-bit-perturbed copies of v-1 at constant offset TRIM_OFFSET."""
    df = (
        spark.range(n_videos)
        .select(F.col("id").alias("media_id"))
        .crossJoin(
            spark.range(FRAMES).select(F.col("id").cast("int").alias("frame_idx"))
        )
        .select(
            "media_id",
            "frame_idx",
            F.expr("media_id - CASE WHEN media_id % 8 = 1 THEN 1 ELSE 0 END")
            .alias("gid"),
            (F.col("media_id") % 8 == 1).alias("is_var"),
        )
        # the copy's frame f shows the base's frame f + TRIM_OFFSET;
        # its last TRIM_OFFSET frames fall off (a head-trimmed copy)
        .filter(~F.col("is_var") | (F.col("frame_idx") < FRAMES - TRIM_OFFSET))
        .select(
            "media_id", "frame_idx", "gid", "is_var",
            F.expr(
                f"CASE WHEN is_var THEN frame_idx + {TRIM_OFFSET} "
                "ELSE frame_idx END"
            ).alias("src_frame"),
        )
    )
    base = (
        "CAST(conv(substr(md5(concat(CAST(gid AS STRING), ':', "
        "CAST(src_frame AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    flip = "shiftleft(CAST(1 AS BIGINT), CAST((gid + src_frame) % 60 AS INT))"
    return df.select(
        "media_id",
        "frame_idx",
        F.expr(
            f"CASE WHEN is_var THEN {base} ^ {flip} ELSE {base} END"
        ).alias("fhash"),
    )


def probe_join(
    fh: DataFrame, chunks_col, aligned: bool, min_match_frac: float = 0.8
) -> tuple[int, int]:
    """(candidate vote rows, qualifying offset triples) for one chunk
    geometry — the join/vote algebra of video_phash_near_dup_pairs_offset
    with the chunk column injectable."""
    ex = fh.select(
        F.col("media_id").alias("__id"), "frame_idx", F.col("fhash").alias("__h"),
        F.posexplode(chunks_col).alias("ci", "cv"),
    )
    n_frames = fh.groupBy("media_id").agg(F.count(F.lit(1)).alias("__n"))
    a, b = ex.alias("a"), ex.alias("b")
    cond = (
        (F.col("a.ci") == F.col("b.ci"))
        & (F.col("a.cv") == F.col("b.cv"))
        & (F.col("a.__id") < F.col("b.__id"))
    )
    if aligned:
        cond = cond & (F.col("a.frame_idx") == F.col("b.frame_idx"))
    ham = F.bit_count(F.col("a.__h").bitwiseXOR(F.col("b.__h")))
    cand = (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (F.col("a.frame_idx") - F.col("b.frame_idx")).alias("frame_offset"),
            F.col("a.frame_idx").alias("fi"),
            (ham <= 3).cast("long").alias("ok"),
        )
        .groupBy("id_a", "id_b", "frame_offset", "fi")
        .agg(F.max("ok").alias("ok"))
    )
    votes = (
        cand.groupBy("id_a", "id_b", "frame_offset")
        .agg(F.count(F.lit(1)).alias("__cand"), F.sum("ok").alias("n_match"))
        .join(
            n_frames.select(F.col("media_id").alias("id_a"),
                            F.col("__n").alias("__na")), "id_a")
        .join(
            n_frames.select(F.col("media_id").alias("id_b"),
                            F.col("__n").alias("__nb")), "id_b")
    )
    n_small = F.least(F.col("__na"), F.col("__nb"))
    row = votes.agg(
        F.sum("__cand").alias("cand"),
        F.sum(
            (F.col("n_match") >= F.ceil(F.lit(min_match_frac) * n_small))
            .cast("long")
        ).alias("true"),
    ).first()
    return int(row["cand"]), int(row["true"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", default="500,4000,8000,16000")
    ap.add_argument("--out", default="PHASH_OFFSET_PROBE.json")
    args = ap.parse_args()

    from railgun_spark.operators.phash import phash_chunks, phash_chunks_coarse
    from railgun_spark.session import get_spark

    spark = get_spark("phash_offset_probe")
    geoms = {
        "offset_4x16": (lambda h: phash_chunks(h), False),
        "offset_2x32": (lambda h: phash_chunks_coarse(h), False),
        "aligned_4x16": (lambda h: phash_chunks(h), True),
    }
    results: dict[str, list] = {g: [] for g in geoms}
    for v in (int(x) for x in args.videos.split(",")):
        fh = synth_frames(spark, v).localCheckpoint()
        n_chunks = fh.count() * 4
        for g, (chunk_fn, aligned) in geoms.items():
            t0 = time.time()
            cand, true = probe_join(fh, chunk_fn(F.col("fhash")), aligned)
            row = {
                "videos": v,
                "chunk_rows": n_chunks,
                "candidates": cand,
                "true_pairs": true,
                "cand_per_true": round(cand / max(true, 1), 2),
                "sec": round(time.time() - t0, 2),
            }
            results[g].append(row)
            print(g, row, flush=True)

    out = {"probe": "phash_offset_candidates", "frames_per_video": FRAMES,
           "trim_offset": TRIM_OFFSET, "geometries": results}
    with open(args.out, "w") as fh_out:
        json.dump(out, fh_out, indent=1)
    print(json.dumps({"probe": "phash_offset_candidates", "out": args.out}))


if __name__ == "__main__":
    main()
