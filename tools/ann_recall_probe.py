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

Usage: python tools/ann_recall_probe.py [--out FILE] [--clustered|--widek]
Prints one JSON line:
{"metric": "ann_ivf_recall", "points": [
  {"k": K, "nprobe": P, "recall_at_10": R, "wall_s": W,
   "lists_scanned_frac": P/K}, ...]}

--clustered: planted-cluster mode. The sf embeddings are near-uniform,
so recall ~= lists_scanned_frac no matter how good the quantizer is —
that demonstrates PRUNING, not recall-efficient pruning. This mode
plants a mixture of Gaussians (C centers, sigma-noise, unit-normalized),
trains the coarse quantizer with Lloyd iterations, and shows
recall >> lists_scanned_frac at nprobe << k — the property IVF is FOR.
It also runs the IVF-PQ pure-ADC vs exact-rerank comparison at the same
nprobe, showing the refine leg lifting recall past the PQ resolution
cap. Emits {"metric": "ann_ivf_recall_clustered", ...}.

--widek: recall at PRODUCTION quantizer width (K=512 / K=1024 over a
50k planted-cluster corpus), sweeping nprobe with ADC and rerank50
modes, full- vs sampled-trained quantizers, and per-point nprobe
ceilings; states a measured production default.
Emits {"metric": "ann_ivf_recall_widek", ...}.
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


def clustered_main(out: "str | None") -> int:
    """Planted-cluster recall: recall must BEAT lists_scanned_frac when
    the quantizer matches the data's cluster structure."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from railgun_spark.operators.similarity import (
        _centroid_rows,
        _lit_vec,
        ann_ivf_pq_search_index,
        ann_ivf_search_index,
        assign_clusters,
        build_ivf_index,
        build_ivf_pq_index,
        cosine,
        recompute_centroids,
    )
    from railgun_spark.session import get_spark

    N, DIM, C, SIGMA, NQ = 20_000, 64, 32, 0.25, 20
    K = C  # quantizer sized to the planted cluster count
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((C, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    owner = rng.integers(0, C, size=N + NQ)
    pts = centers[owner] + SIGMA * rng.standard_normal((N + NQ, DIM))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    spark = get_spark("ann_recall_clustered")
    pdf = pd.DataFrame({
        "vec_id": np.arange(N + NQ, dtype=np.int64),
        "label": [f"c{c}" for c in owner],
        "v": [row.tolist() for row in pts],
    })
    emb = spark.createDataFrame(pdf).localCheckpoint()
    query_ids = list(range(N, N + NQ))  # the held-out tail
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), "v"
    ).localCheckpoint()
    indexed = emb.filter(~F.col("vec_id").isin(query_ids))

    exact: dict[int, list[int]] = {}
    for r in queries.collect():
        qid, qv = int(r["qid"]), list(r["v"])
        rows = (
            indexed.select(
                "vec_id", F.round(cosine(F.col("v"), _lit_vec(qv)), 6).alias("c")
            ).orderBy(F.desc("c"), "vec_id").limit(TOPK).collect()
        )
        exact[qid] = [int(x["vec_id"]) for x in rows]

    # trained coarse quantizer: Lloyd from the first-K init until the
    # assignment stabilizes at the planted structure (5 iters is plenty)
    base = indexed.select("vec_id", F.col("v").alias("e"))
    cents = dict(_centroid_rows(indexed, K))
    for _ in range(5):
        cents = recompute_centroids(assign_clusters(base, cents))
    trained = sorted(cents.items())

    def recall_of(got_rows) -> float:
        by_q: dict[int, set] = {}
        for r in got_rows:
            by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
        return sum(
            len(by_q.get(q, set()) & set(v)) / TOPK for q, v in exact.items()
        ) / len(exact)

    points = []
    with tempfile.TemporaryDirectory(prefix="ivf_clustered_") as d:
        build_ivf_index(emb, d, k=K, exclude_ids=tuple(query_ids),
                        centroids=trained)
        for nprobe in (1, 2, 4, K):
            t0 = time.time()
            got = ann_ivf_search_index(
                spark, queries, d, nprobe=nprobe, topk=TOPK
            ).collect()
            pt = {
                "index": "ivf", "k": K, "quantizer": "trained-lloyd5",
                "nprobe": nprobe, "recall_at_10": round(recall_of(got), 4),
                "wall_s": round(time.time() - t0, 2),
                "lists_scanned_frac": round(nprobe / K, 4),
            }
            points.append(pt)
            print(f"ivf    nprobe={nprobe:3d} recall@10={pt['recall_at_10']:.4f} "
                  f"scanned={pt['lists_scanned_frac']:.4f}", flush=True)
    # the earned property: at nprobe<k, recall far above scanned fraction
    low = [p for p in points if p["nprobe"] < K]
    assert all(p["recall_at_10"] > 3 * p["lists_scanned_frac"] for p in low), low
    assert points[-1]["recall_at_10"] == 1.0, points[-1]

    # IVF-PQ: pure ADC vs exact rerank at the same probes. Coarse
    # quantizer = the trained Lloyd centroids; PQ codebooks trained
    # per-subspace with driver-side numpy kmeans on the sample (the
    # standard production recipe — codebooks are tiny, training them is
    # driver work on a sample even at 100 TB). Even trained, 4x16-codeword
    # codes resolve only ~65k cells over 20k points — the resolution cap
    # the rerank leg removes.
    def train_codebooks(sample: np.ndarray, m: int, ncode: int,
                        iters: int = 8):
        ds = sample.shape[1] // m
        books = {}
        for mm in range(m):
            sub = sample[:, mm * ds:(mm + 1) * ds]
            cb = sub[:ncode].copy()
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                for j in range(ncode):
                    sel = sub[a == j]
                    if len(sel):
                        cb[j] = sel.mean(axis=0)
            books[mm] = [(j + 1, cb[j].tolist()) for j in range(ncode)]
        return books

    # Three code setups over the same trained coarse quantizer:
    # - 4x16 raw (the tiny oracle shape): 16 bits/vector — the measured
    #   resolution cap (r15: pure-ADC 0.065) that rerank cures.
    # - 8x256 raw (production width): 64 bits/vector — wider codes help
    #   but raw-vector codebooks still spend resolution on the between-
    #   cluster variance every list member shares.
    # - 8x256 residual (IVFADC, the FAISS default): codes on
    #   v - centroid(cid) — the codebooks resolve intra-list structure,
    #   which is where the top-10 live on clustered data
    #   (target: ADC-only >= ~0.6, rerank50 >= ~0.9 at nprobe=2).
    cmat = np.asarray([cv for _, cv in trained])

    def residualize(X: np.ndarray) -> np.ndarray:
        sims = (X @ cmat.T) / np.linalg.norm(cmat, axis=1)[None, :]
        return X - cmat[sims.argmax(1)]

    # NOTE the ceilings: nprobe=2 probes lists holding 0.87 of the true
    # top-10 (the IVF rows above), so 0.87 is PERFECT refine at nprobe=2
    # — rerank recall above it is impossible and the gap to 1.0 is the
    # coarse quantizer's, not PQ's. 16x256 is FAISS's PQ16 shape
    # (128 bits): on this corpus (isotropic sigma-noise around centers —
    # the hardest case for PQ, no sub-cluster structure to learn) code
    # width is the binding constraint on ADC ordering.
    for geom, m_, ks_, res in (("4x16", 4, 16, False),
                               ("8x256", 8, 256, False),
                               ("8x256-res", 8, 256, True),
                               ("16x256-res", 16, 256, True)):
        sample = residualize(pts[:N]) if res else pts[:N]
        books = train_codebooks(sample, m_, ks_)
        with tempfile.TemporaryDirectory(prefix="ivfpq_clustered_") as d:
            build_ivf_pq_index(emb, d, k=K, exclude_ids=tuple(query_ids),
                               store_raw=True, centroids=trained,
                               codebooks=books, residual=res)
            for nprobe in (2, 4):
                for mode, kw in (("adc", {}), ("rerank50", {"rerank": 50}),
                                 ("rerank400", {"rerank": 400})):
                    t0 = time.time()
                    got = ann_ivf_pq_search_index(
                        spark, queries, d, nprobe=nprobe, topk=TOPK, **kw
                    ).collect()
                    pt = {
                        "index": "ivf_pq", "geometry": geom, "k": K,
                        "mode": mode, "nprobe": nprobe,
                        "recall_at_10": round(recall_of(got), 4),
                        "wall_s": round(time.time() - t0, 2),
                        "lists_scanned_frac": round(nprobe / K, 4),
                    }
                    points.append(pt)
                    print(f"ivf_pq {geom:6s} {mode:8s} nprobe={nprobe:3d} "
                          f"recall@10={pt['recall_at_10']:.4f}", flush=True)

    line = json.dumps({
        "metric": "ann_ivf_recall_clustered", "n": N, "dim": DIM,
        "planted_clusters": C, "sigma": SIGMA, "n_queries": NQ,
        "points": points,
    })
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return 0


def widek_main(out: "str | None") -> int:
    """Recall at PRODUCTION quantizer width (VERDICT r16 worklist #1):
    the r16 recall ladder ran at K=32 while the wide-K grid measured
    K=512 perf only — this mode measures the missing curve. Planted
    clusters (C centers << K lists, so the trained quantizer
    SUB-partitions each cluster — the production regime where a query's
    neighbors spread over several lists), coarse quantizer Lloyd-trained
    through the library's own wide-K BLAS path, 16x256-residual codes
    (the r16 production geometry), swept across nprobe with both
    pure-ADC and rerank50 modes. Each point also reports the nprobe
    CEILING (fraction of true top-10 inside the probed lists) so code
    quality and probe coverage are separated. The quantizer is trained
    both ways — full corpus and the bounded deterministic sample
    (worklist #2) — so recall-unchanged-under-sampled-training is a
    measured column, not a claim; and the whole grid runs over TWO
    corpora (tight sigma=0.05 and near-isotropic sigma=0.2 clusters),
    because coverage at a fixed scanned fraction is a corpus property,
    not a quantizer one. Emits {"metric": "ann_ivf_recall_widek", ...}
    with a production_default block stating the recommended (K, nprobe,
    geometry, rerank) and its measured recall/scanned fraction on both
    corpora."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from railgun_spark.operators.similarity import (
        _np_round6,
        ann_ivf_pq_search_index,
        build_ivf_pq_index,
        train_ivf_centroids,
    )
    from railgun_spark.session import get_spark

    N, DIM, C, NQ = 50_000, 64, 200, 20
    M, KS = 16, 256
    # Two corpora, same centers/ownership, different cluster TIGHTNESS:
    # sigma scales isotropic noise around unit centers, and its
    # sqrt(dim)-scaled norm vs the unit center is what decides whether
    # the corpus is really clustered. sigma=0.05 (noise norm ~0.4):
    # tight clusters, the regime IVF is FOR. sigma=0.2 (noise norm
    # ~1.6 > the center!): near-isotropic — the measured r17 finding is
    # that there the probe-coverage ceiling is a pure function of the
    # scanned FRACTION (K=512 and K=1024 trace the same curve), so no
    # quantizer improvement helps and the only recall knob is nprobe.
    # Per corpus: (K, quantizer-training, nprobes). K=512 carries the
    # full-vs-sampled training parity; K=1024 pins the
    # fixed-fraction-invariance finding on the diffuse corpus.
    CORPORA = (
        (0.05, (
            (512, "sampled-20k", {"sample": 20_000}, (2, 8, 16, 32)),
        )),
        (0.2, (
            (512, "full", {"sample": None}, (2, 8, 16, 32)),
            (512, "sampled-20k", {"sample": 20_000}, (2, 8, 16, 32)),
            (1024, "sampled-20k", {"sample": 20_000}, (8, 16, 32, 48)),
        )),
    )

    spark = get_spark("ann_recall_widek")

    def make_corpus(sigma: float):
        rng = np.random.default_rng(17)
        centers = rng.standard_normal((C, DIM))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        owner = rng.integers(0, C, size=N + NQ)
        pts = centers[owner] + sigma * rng.standard_normal((N + NQ, DIM))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pdf = pd.DataFrame({
            "vec_id": np.arange(N + NQ, dtype=np.int64),
            "label": [f"c{c}" for c in owner],
            "v": [row.tolist() for row in pts],
        })
        emb = spark.createDataFrame(pdf).localCheckpoint()
        query_ids = list(range(N, N + NQ))
        queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("qid"), "v"
        ).localCheckpoint()
        indexed = emb.filter(~F.col("vec_id").isin(query_ids))
        # exact ground truth, driver-side BLAS (50k x 20 is
        # driver-trivial; rounded-cosine desc with vec_id tiebreak, the
        # search's semantics)
        Xi, Xq = pts[:N], pts[N:]
        sims = _np_round6(Xq @ Xi.T)  # unit vectors: dot = cosine
        exact = {}
        for qi in range(NQ):
            order = np.lexsort((np.arange(N), -sims[qi]))[:TOPK]
            exact[N + qi] = [int(v) for v in order]
        return emb, queries, indexed, Xi, Xq, exact, query_ids

    def train_codebooks(sample: np.ndarray, m: int, ncode: int,
                        iters: int = 8):
        ds = sample.shape[1] // m
        books = {}
        for mm in range(m):
            sub = sample[:, mm * ds:(mm + 1) * ds]
            cb = sub[:ncode].copy()
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                for j in range(ncode):
                    sel = sub[a == j]
                    if len(sel):
                        cb[j] = sel.mean(axis=0)
            books[mm] = [(j + 1, cb[j].tolist()) for j in range(ncode)]
        return books

    points = []
    for SIGMA, CONFIGS in CORPORA:
      emb, queries, indexed, Xi, Xq, exact, query_ids = make_corpus(SIGMA)

      def recall_of(got_rows, exact=exact) -> float:
        by_q: dict[int, set] = {}
        for r in got_rows:
            by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
        return sum(
            len(by_q.get(q, set()) & set(v)) / TOPK for q, v in exact.items()
        ) / len(exact)

      for K, trained_on, sample_kw, NPROBES in CONFIGS:
        t0 = time.time()
        trained = train_ivf_centroids(
            indexed.select("vec_id", "v"), k=K, iters=5, **sample_kw
        )
        train_s = time.time() - t0
        print(f"quantizer[s={SIGMA} K={K} {trained_on}] trained in "
              f"{train_s:.1f}s", flush=True)

        # per-nprobe recall CEILING: fraction of each query's true
        # top-10 inside its nprobe nearest lists (driver BLAS, the
        # search's own argmax/argsort semantics)
        cmat = np.asarray([cv for _, cv in trained])
        c_n = np.linalg.norm(cmat, axis=1)
        a_sims = _np_round6(
            (Xi @ cmat.T)
            / (np.linalg.norm(Xi, axis=1)[:, None] * c_n[None, :])
        )
        assigned_cid = a_sims.argmax(axis=1)  # first-max = lowest cid pos
        q_sims = _np_round6(
            (Xq @ cmat.T)
            / (np.linalg.norm(Xq, axis=1)[:, None] * c_n[None, :])
        )
        q_order = np.argsort(-q_sims, axis=1, kind="stable")

        def ceiling(nprobe: int) -> float:
            tot = 0.0
            for qi in range(NQ):
                probed = set(q_order[qi, :nprobe].tolist())
                tot += sum(
                    1 for v in exact[N + qi] if assigned_cid[v] in probed
                ) / TOPK
            return tot / NQ

        # residual codebooks against THIS quantizer (driver kmeans on
        # the residualized corpus — the r16 ladder's recipe)
        a_cents = cmat[assigned_cid]
        books = train_codebooks(Xi - a_cents, M, KS)

        with tempfile.TemporaryDirectory(prefix="ivfpq_widek_") as d:
            t0 = time.time()
            build_ivf_pq_index(emb, d, k=K, exclude_ids=tuple(query_ids),
                               store_raw=True, centroids=trained,
                               codebooks=books, residual=True)
            build_s = time.time() - t0
            print(f"build[K={K} {trained_on}] {build_s:.1f}s", flush=True)
            for nprobe in NPROBES:
                ceil = round(ceiling(nprobe), 4)
                for mode, kw in (("adc", {}), ("rerank50", {"rerank": 50})):
                    t0 = time.time()
                    got = ann_ivf_pq_search_index(
                        spark, queries, d, nprobe=nprobe, topk=TOPK, **kw
                    ).collect()
                    pt = {
                        "sigma": SIGMA,
                        "quantizer": trained_on, "k": K,
                        "geometry": f"{M}x{KS}-res", "mode": mode,
                        "nprobe": nprobe,
                        "recall_at_10": round(recall_of(got), 4),
                        "nprobe_ceiling": ceil,
                        "wall_s": round(time.time() - t0, 2),
                        "lists_scanned_frac": round(nprobe / K, 4),
                        "train_s": round(train_s, 1),
                        "build_s": round(build_s, 1),
                    }
                    points.append(pt)
                    print(
                        f"s={SIGMA} K={K:4d} {trained_on:11s} {mode:8s} "
                        f"nprobe={nprobe:3d} "
                        f"recall@10={pt['recall_at_10']:.4f} "
                        f"ceiling={ceil:.4f} "
                        f"scanned={pt['lists_scanned_frac']:.4f}",
                        flush=True,
                    )

    # production default: the cheapest measured (K, nprobe, mode)
    # meeting recall@10 >= 0.9 at <= ~5% of lists scanned on the TIGHT
    # (really-clustered) corpus, with a SAMPLED-trained quantizer (the
    # production training path). The same cell's recall on the diffuse
    # corpus rides along: on near-isotropic data the coverage ceiling
    # is a function of scanned fraction alone and the knob is nprobe.
    candidates = [
        p for p in points
        if p["sigma"] == 0.05 and p["quantizer"].startswith("sampled")
        and p["recall_at_10"] >= 0.9 and p["lists_scanned_frac"] <= 0.05
    ]
    default = min(
        candidates, key=lambda p: (p["lists_scanned_frac"], p["mode"] != "adc")
    ) if candidates else None
    diffuse_same = default and next(
        (p for p in points
         if p["sigma"] == 0.2 and p["k"] == default["k"]
         and p["nprobe"] == default["nprobe"] and p["mode"] == default["mode"]
         and p["quantizer"] == default["quantizer"]), None)
    line = json.dumps({
        "metric": "ann_ivf_recall_widek", "n": N, "dim": DIM,
        "planted_clusters": C,
        "sigmas": [s for s, _ in CORPORA], "n_queries": NQ,
        "k_values": sorted({c[0] for _, cfgs in CORPORA for c in cfgs}),
        "geometry": f"{M}x{KS}-res",
        "points": points,
        "production_default": default and {
            "k": default["k"], "nprobe": default["nprobe"],
            "geometry": default["geometry"], "mode": default["mode"],
            "recall_at_10": default["recall_at_10"],
            "lists_scanned_frac": default["lists_scanned_frac"],
            "corpus_sigma": default["sigma"],
            "diffuse_corpus_recall_at_10":
                diffuse_same and diffuse_same["recall_at_10"],
        },
    })
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return 0


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
    if "--clustered" in sys.argv:
        if "--out" in sys.argv:
            out = sys.argv[sys.argv.index("--out") + 1]
        return clustered_main(out)
    if "--widek" in sys.argv:
        if "--out" in sys.argv:
            out = sys.argv[sys.argv.index("--out") + 1]
        return widek_main(out)
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
