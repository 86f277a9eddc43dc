"""Persistent-IVF recall/latency sweep: build a cid-partitioned index
(similarity.build_ivf_index) over the sf0.1 embeddings at two coarse-
quantizer sizes, then sweep nprobe and report recall@10 against the
exact brute-force top-10 for a 20-query held-out batch, plus the wall
per batch and the fraction of inverted lists scanned.

This is the honest accuracy/cost decomposition for the ANN scale path:
at 100 TB the scan cost tracks nprobe/k (partition pruning — pinned in
tests/test_dedup_similarity.py), so the sweep shows exactly what recall
each scan fraction buys. Recall is measured, not assumed: the first-K
coarse quantizer is untrained, so low-nprobe recall is a FLOOR (trained
kmeans centroids tighten the lists; the layout is identical).

Usage: python tools/ann_recall_probe.py [--out FILE]
Prints one JSON line:
{"metric": "ann_ivf_recall", "points": [
  {"k": K, "nprobe": P, "recall_at_10": R, "wall_s": W,
   "lists_scanned_frac": P/K}, ...]}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
QUERY_IDS = tuple(range(100, 120))
TOPK = 10


def main() -> int:
    from pyspark.sql import functions as F

    from railgun_spark.operators.similarity import (
        _lit_vec,
        ann_ivf_search_index,
        build_ivf_index,
        cosine,
        to_double,
    )
    from railgun_spark.session import get_spark

    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    spark = get_spark("ann_recall_probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "label", to_double(F.col("embedding")).alias("v")
    ).localCheckpoint()
    queries = emb.filter(F.col("vec_id").isin(list(QUERY_IDS))).select(
        F.col("vec_id").alias("qid"), "v"
    ).localCheckpoint()
    qvecs = {int(r["qid"]): list(r["v"]) for r in queries.collect()}

    # exact ground truth: brute-force top-10 per query over the indexed
    # set (one pass per query over a tiny corpus; at production scale
    # the ground truth comes from the brute-force query, sampled)
    exact: dict[int, list[int]] = {}
    indexed = emb.filter(~F.col("vec_id").isin(list(QUERY_IDS)))
    for qid, qv in qvecs.items():
        rows = (
            indexed.select(
                "vec_id",
                F.round(cosine(F.col("v"), _lit_vec(qv)), 6).alias("c"),
            )
            .orderBy(F.desc("c"), "vec_id")
            .limit(TOPK)
            .collect()
        )
        exact[qid] = [int(r["vec_id"]) for r in rows]

    def trained_centroids(k: int) -> list:
        """2 Lloyd iterations from the first-K init — the kmeans helpers
        reused verbatim (column renamed to their 'e' convention)."""
        from railgun_spark.operators.similarity import (
            _centroid_rows,
            assign_clusters,
            recompute_centroids,
        )

        base = indexed.select("vec_id", F.col("v").alias("e"))
        cents = dict(_centroid_rows(emb, k))
        for _ in range(2):
            cents = recompute_centroids(assign_clusters(base, cents))
        return sorted(cents.items())

    points = []
    for k in (8, 32):
        for quantizer in ("first-k", "trained"):
            cents = trained_centroids(k) if quantizer == "trained" else None
            with tempfile.TemporaryDirectory(prefix=f"ivf_probe_k{k}_") as d:
                build_ivf_index(
                    emb, d, k=k, exclude_ids=QUERY_IDS, centroids=cents
                )
                for nprobe in (1, 2, 4, k):
                    t0 = time.time()
                    got = ann_ivf_search_index(
                        spark, queries, d, nprobe=nprobe, topk=TOPK
                    ).collect()
                    wall = time.time() - t0
                    by_q: dict[int, set] = {}
                    for r in got:
                        by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
                    recall = sum(
                        len(by_q.get(q, set()) & set(exact[q])) / TOPK
                        for q in qvecs
                    ) / len(qvecs)
                    pt = {
                        "k": k, "quantizer": quantizer, "nprobe": nprobe,
                        "recall_at_10": round(recall, 4),
                        "wall_s": round(wall, 2),
                        "lists_scanned_frac": round(nprobe / k, 4),
                    }
                    points.append(pt)
                    print(f"k={k:3d} {quantizer:7s} nprobe={nprobe:3d} "
                          f"recall@10={recall:.4f} wall={wall:5.2f}s "
                          f"lists={nprobe}/{k}", flush=True)
            # full-probe sanity: scanning every list must be exact
            assert points[-1]["recall_at_10"] == 1.0, points[-1]

    line = json.dumps({"metric": "ann_ivf_recall", "sf": 0.1,
                       "n_queries": len(qvecs), "points": points})
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
