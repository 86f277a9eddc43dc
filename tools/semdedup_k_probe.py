"""SemDeDup K-scaling probe: the semantic-dedup docstrings claim the
paper's scale knob — "K grows with the corpus" keeps within-cluster
all-pairs work bounded (sum of cluster_size^2 ~ n^2/K, so K ∝ n holds
per-doc cost constant). The sf1 sweep shows the certification query at
its FIXED oracle K=16 paying the full quadratic (43-52 s at 10x
vectors); this probe demonstrates the knob actually works: the same
pipeline at the sf1 dataset with K=16 vs K=160 (scaled 10x with the
corpus), timing the assignment + within-cluster pair join.

Usage: python tools/semdedup_k_probe.py [k ...]   (default 16 160)
Env: SPARK_GRAFT_SF1_DIR (default /tmp/sf1_probe; built on demand).
Prints one JSON line: {"metric": "semdedup_k_scaling",
  "cells": [{"k": K, "sec": s, "pairs": n}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from railgun_spark.operators.similarity import (
        SEMDEDUP_COS,
        assign_clusters_batch,
        dot,
        to_double,
    )
    from railgun_spark.session import get_spark
    from tools.sf1_probe import _build_sf1

    ks = [int(a) for a in sys.argv[1:]] or [16, 160]
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_probe")
    spark = get_spark("semdedup_k_probe")
    _build_sf1(spark, sf1_dir)

    emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet").select(
        "vec_id", to_double(F.col("embedding")).alias("e")
    ).localCheckpoint()
    n = emb.count()

    cells = []
    for k in ks:
        t0 = time.time()
        init_rows = emb.orderBy("vec_id").limit(k).collect()
        c0 = {int(r["vec_id"]): list(r["e"]) for r in init_rows}
        # production fan-out path: one BLAS argmin per Arrow batch —
        # the literal-expression argmin is O(K) Catalyst nodes per row
        a = assign_clusters_batch(emb, c0).select("vec_id", "e", "cluster")
        an = a.select(
            "cluster", "vec_id",
            F.sqrt(dot(F.col("e"), F.col("e"))).alias("nrm"), "e",
        ).select(
            "cluster", "vec_id",
            F.transform("e", lambda x: x / F.col("nrm")).alias("en"),
        ).localCheckpoint()
        x = an.select("cluster", F.col("vec_id").alias("vec_a"),
                      F.col("en").alias("ena"))
        y = an.select("cluster", F.col("vec_id").alias("vec_b"),
                      F.col("en").alias("enb"))
        pairs = (
            x.join(y, "cluster")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn("cos_sim", F.round(dot(F.col("ena"), F.col("enb")), 6))
            .filter(F.col("cos_sim") >= SEMDEDUP_COS)
            .count()
        )
        dt = time.time() - t0
        cells.append({"k": k, "sec": round(dt, 2), "pairs": pairs})
        print(f"k={k:5d}  {dt:7.2f}s  pairs={pairs}", flush=True)

    print(json.dumps({
        "metric": "semdedup_k_scaling", "n_vectors": n, "cells": cells,
    }))
    return 0


if __name__ == "__main__":
    main()
