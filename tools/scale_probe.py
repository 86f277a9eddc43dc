"""Scale-linearity probe: blow the sf0.1 corpus up k-fold (k salted
copies, near-identical text => every doc lands in a k-wide duplicate
cluster) and time MinHash-LSH near-dup detection at each size.

What it demonstrates (numbers from local[32], 2026-08-13 run):

    x1: docs=5000   pairs=246     sec=5.2   (includes JVM warmup)
    x2: docs=10000  pairs=5960    sec=2.4
    x4: docs=20000  pairs=33776   sec=3.1
    x8: docs=40000  pairs=154978  sec=3.9

8x the corpus with a ~26x explosion in true near-dup pairs costs <2x the
x2 wall time: the band-bucket equi-join scales with CANDIDATES (which
track true duplicates), never with doc^2, and the shingle/signature
stages are embarrassingly parallel map work. This is the property that
makes the operator viable at 100 TB — an all-pairs design would have
gone quadratic at x2. Giant duplicate clusters (the skew case) land in
the same band buckets; AQE skew-join splitting (on in session.py) keeps
those buckets from serializing a straggler.

Also probes round-6 heavy operators on the same blown-up corpora:
`dedup_containment` (rare-shingle blocked candidates + lossless count
prefilter — cost tracks candidate pairs, which track duplicate density)
and `cross_source_overlap` (deduped shingle equi-join, cost tracks
distinct (shingle, source) rows).

Round-7 additions: the two iterative operators (`pagerank` — 3 supersteps
over the word graph; `clusters` — min-label connected components to
survivor selection) get recorded curves, and `recall` reports the
containment blocker's per-run `n_docs_no_rare_shingles` counter at each
blow-up factor (the df-cap's recall trade, observable instead of silent —
salted copies multiply every shingle's document frequency, so rising k is
exactly the adversarial case for the cap). Measured (local[32],
2026-08-14):

    recall   x1: no_rare=0 5.9s   x2: 0 3.3s   x4: 0 4.1s   x8: 0 3.6s
    pagerank x1: 3.5s  x2: 3.3s  x4: 3.3s  x8: 3.5s   (flat: capped
        per-doc fan-out => vertex set grows with vocabulary, not corpus)
    clusters x1: 4.0s  x2: 4.6s  x4: 9.7s  x8: 8.2s   (8x docs, 20x
        cluster rows, ~2x wall — label propagation cost tracks edges,
        which track true duplicate pairs)

The recall counter staying 0 even at x8 is expected for THIS blow-up
shape: every salted copy keeps its own `copysetN` suffix shingles, which
stay rare. The counter exists for the production case (boilerplate shared
verbatim by >CAP organic docs) that synthetic salting can't produce.

Embedding modality (blown-up embeddings are EXACT-duplicate cliques —
the adversarial case where true pairs grow quadratically in duplication;
measured local[32], 2026-08-14):

    semdedup x1: 185 pairs 4.9s   x2: 2.7k 4.3s   x4: 15k 7.0s
             x8: 68k pairs 13.9s   (8x vecs, 367x pairs, 2.8x wall)
    embnear  (r8 geometry, 16x3-bit bands, recall 0.99 at cos 0.4;
              computed as the COMMUTED intersection — exact block-matmul
              pairs filtered to band-colliders by a map-side zip_with):
             x1: 910 pairs 6.1s   x2: 5.6k 4.0s   x4: 27k 3.4s
             x8: 114k pairs 9.4s  (8x vecs, 125x pairs, 2.3x the x2
        wall). Two naive forms were measured and rejected on this probe:
        banded-join + per-candidate vector verify (50 s at x4 — the
        S-curve admits ~88% of background pairs at tau=0.4) and
        banded-join + matmul-pruned verify (67 s at x8 — 3-bit bands
        have only bands*2^bits keys, so the band equi-join ITSELF is
        quadratic per key). The rewrite keeps banded semantics exactly
        (the canary still measures banding misses: 640 at x8).
    embexact (lossless blocked-matmul self-join, recall 1.0):
             x1: 920 pairs 6.9s   x2: 5.7k 3.1s   x4: 27k 3.5s
             x8: 115k pairs 4.3s  (8x vecs, 125x pairs, 1.4x the x2
        wall) — same O(n^2 d) arithmetic but in BLAS, shuffle linear in
        n_blocks replication; candidate rows are 16 bytes and only TRUE
        pairs ever ship vectors (the Catalyst re-verify).

semdedup/embnear/embexact track TRUE duplicate pairs, never vecs^2-sized
shuffles — the same property the MinHash curve establishes for text;
the geometry note in similarity.py routes low-threshold users to
embexact (recall 1.0 at the same cost).

Round-7 late-wave curves (lossless prefix-filter joins + span removal;
salted copies form k-wide J~1 cliques so TRUE pairs grow ~k^2 per clique
while docs grow k; measured local[32], 2026-08-14):

    jaccard          x1: 69 pairs 7.0s (warmup)  x2: 5.3k 3.5s
                     x4: 31k 4.1s   x8: 144k pairs 8.8s
        8x docs, ~27x the x2 pair count, 2.5x the x2 wall — candidate
        cost tracks true pairs, never docs^2 (the old all-pairs form
        was 87 s at x1 alone)
    containment_exact x1: 249 pairs 3.3s  x2: 5.9k 2.8s  x4: 34k 4.1s
                     x8: 155k pairs 5.3s
        faster than the df-capped blocker at EVERY k (capped was 6.2 s
        at x8 in the round-6 run) with zero recall caveat
    span             flat 0.5-0.8 s x1-x8 — two hash-keyed shuffles and
        a map-side rewrite, cost tracks corpus size linearly
    lrtrain          5-iteration distributed LR: 6.8 / 6.8 / 7.4 s at
        x2/x4/x8 (x1 10.8 s includes warmup) — per-iteration cost is
        shuffle-overhead bound at these sizes; the gradient aggregate
        stays D rows regardless of corpus scale

Usage: python tools/scale_probe.py [max_k] [op ...]
  ops: minhash (default), containment, overlap, recall, pagerank,
       clusters, semdedup, embnear, jaccard, containment_exact, span
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from railgun_spark.operators.dedup import (
        containment_recall_report,
        dedup_cluster_survivors,
        dedup_containment,
        dedup_containment_exact,
        dedup_ngram_jaccard,
        duplicated_span_removal,
        minhash_dup_pairs,
    )
    from railgun_spark.operators.graph import pagerank_word_graph
    from railgun_spark.operators.reporting import cross_source_overlap
    from railgun_spark.session import get_spark

    from railgun_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_neardup_exact_pairs,
        semantic_dedup_pairs,
    )

    def _lrtrain_probe(spark, d):
        from pyspark.sql import functions as F

        from railgun_spark.operators.text import train_quality_classifier

        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).withColumn(
            "label", (F.col("doc_id") % 2).cast("int")
        )
        w = train_quality_classifier(docs, "label", iters=5)
        # runner prints rows=; report nonzero weights as the "row" count
        class _N:
            def count(self_inner):
                return sum(1 for x in w if x != 0.0)

        return _N()

    args = sys.argv[1:]
    max_k = int(args[0]) if args and args[0].isdigit() else 8
    ops = [a for a in args if not a.isdigit()] or ["minhash"]
    runner = {
        "minhash": lambda spark, d: minhash_dup_pairs(spark, d, 0.5),
        "containment": dedup_containment,
        "overlap": cross_source_overlap,
        "recall": containment_recall_report,
        "pagerank": pagerank_word_graph,
        "clusters": dedup_cluster_survivors,
        # embedding modality: blown-up embeddings are EXACT duplicates
        # (same vector, new vec_id), so every copy set is a true near-dup
        # clique — pair counts grow ~k^2 per clique, the adversarial case
        "semdedup": semantic_dedup_pairs,
        "embnear": embedding_near_dup_pairs,
        "embexact": embedding_neardup_exact_pairs,
        # round-7 late wave: the lossless prefix-filter joins. Salted
        # copies form k-wide J~1 cliques, so true pairs grow ~k^2 per
        # clique while docs grow k — exactly the shape that separates
        # candidate-tracking cost from docs^2 cost.
        "jaccard": dedup_ngram_jaccard,
        "containment_exact": dedup_containment_exact,
        "span": duplicated_span_removal,
        # distributed LR trainer (5 iterations, parity labels — the cost
        # is label-independent): per-iter one broadcast-weight join, one
        # per-doc dot, one per-bucket gradient aggregate
        "lrtrain": _lrtrain_probe,
    }
    EMB_OPS = {"semdedup", "embnear", "embexact"}
    spark = get_spark("scale_probe")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    emb_base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n0 = base.count()
    e0 = emb_base.count()

    def blowup(k: int):
        parts = [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copyset{i}")).alias("text"),
                "lang",
                F.concat(F.col("source"), F.lit(f"_{i}")).alias("source"),
            )
            for i in range(k)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def blowup_emb(k: int):
        parts = [
            emb_base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                "label",
                "embedding",
            )
            for i in range(k)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    k = 1
    while k <= max_k:
        d = tempfile.mkdtemp(prefix=f"blow{k}_")
        blowup(k).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        if any(op in EMB_OPS for op in ops):
            blowup_emb(k).write.mode("overwrite").parquet(
                os.path.join(d, "embeddings.parquet")
            )
        for op in ops:
            t = time.time()
            if op == "recall":
                row = runner[op](spark, d).collect()[0]
                print(
                    f"recall x{k}: docs={row['n_docs']} "
                    f"no_rare_shingles={row['n_docs_no_rare_shingles']} "
                    f"sec={time.time() - t:.2f}"
                )
                continue
            n = runner[op](spark, d).count()
            base_n = e0 if op in EMB_OPS else n0
            unit = "vecs" if op in EMB_OPS else "docs"
            print(f"{op} x{k}: {unit}={base_n * k} rows={n} sec={time.time() - t:.2f}")
        k *= 2


if __name__ == "__main__":
    main()
