"""Third scale point for the steepest linear-class curves.

The r11 full-registry sweep (SF1_ALL_r11.json) bounded every query at
10x keyspace, but five linear-class queries showed ratios in the 4.6-7.2
range — sub-linear-bound yet steep enough that two points can't
distinguish "fixed overhead amortizing out" from "super-linear term
taking over". This probe adds a x4-of-sf1 point (40 copies of sf0.1,
same key-shift construction as tools/sf1_probe.py) and reports the
three-point curve: if the sf1->sf4 ratio lands at or below ~4x (data
ratio) while sf0.1->sf1 sat above it, the curve is bending FLAT
(amortization) and the query is certified linear; a ratio that keeps
steepening names a real super-linear term.

Only the tables the five queries read (orders, lineitem, events) are
materialized — documents/embeddings stay out of the build so the probe
is cheap enough to re-run per round.

Usage: python tools/sf4_probe.py [--out SF4_PROBE.json] [query ...]
Env: SPARK_GRAFT_SF4_BASE (default /tmp) for the two generated dirs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
SHIFT = 10**8

# the five steepest non-quadratic curves from SF1_ALL_r11.json, plus the
# SemDeDup production path (corpus-scaled K: the third point exercises
# K=640 over 80k vectors through the BLAS batch argmin)
QUERIES = (
    "revenue_percentiles",       # x6.75 at 10x
    "conditional_agg_priority",  # x7.14
    "session_window_counts",     # x4.80
    "sessionize_events",         # x4.59
    "asof_join_orders_events",   # x4.97
    "semantic_dedup_scaled",     # production knob, K grows with corpus
)
EMB_QUERIES = {"semantic_dedup_scaled"}  # need the embeddings table


def build_embeddings(spark, out_dir: str, k: int) -> None:
    """embeddings at k copies of sf0.1 with the sf1_probe sign-flip
    perturbation (cross-copy cosine pushed below every threshold)."""
    marker = os.path.join(out_dir, f"_SF_EMB_K{k}")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def emb_copy(df, i):
        if i == 0:
            flipped = F.col("embedding")
        else:
            flipped = F.transform(
                "embedding",
                lambda x, idx: F.when((idx * 7 + i * 13) % 5 == 0, -x).otherwise(x),
            )
        return df.select(
            (F.col("vec_id") + i * SHIFT).alias("vec_id"),
            flipped.alias("embedding"), "label",
        )

    out = emb_copy(emb, 0)
    for i in range(1, k):
        out = out.unionByName(emb_copy(emb, i))
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    with open(marker, "w") as f:
        f.write("{}")


def build_tables(spark, out_dir: str, k: int) -> None:
    """orders/lineitem/events at k copies of sf0.1, keys shifted per copy
    (the sf1_probe construction restricted to the tables these queries
    read)."""
    marker = os.path.join(out_dir, f"_SF_TABLES_K{k}")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    def copies(df, build):
        out = build(df, 0)
        for i in range(1, k):
            out = out.unionByName(build(df, i))
        return out

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    copies(orders, lambda df, i: df.select(
        (F.col("o_orderkey") + i * SHIFT).alias("o_orderkey"),
        (F.col("o_custkey") + i * SHIFT).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    )).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    copies(li, lambda df, i: df.select(
        (F.col("l_orderkey") + i * SHIFT).alias("l_orderkey"),
        (F.col("l_partkey") + i * SHIFT).alias("l_partkey"),
        (F.col("l_suppkey") + i * SHIFT).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    from railgun_spark.sources.tables import load_events

    ev = load_events(spark, SRC)
    copies(ev, lambda df, i: df.select(
        (F.col("event_id") + i * SHIFT).alias("event_id"),
        "ts",
        (F.col("user_id") + i * SHIFT).alias("user_id"),
        "event_type", "value", "props",
    )).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    with open(marker, "w") as f:
        f.write(json.dumps({"built_s": round(time.time() - t0, 1), "k": k}))
    print(f"k={k} tables built in {time.time() - t0:.0f}s at {out_dir}",
          flush=True)


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    from railgun_spark import suite

    fn = suite.all_queries()[name]
    t0 = time.time()
    rows = len(fn(spark, sf_dir).collect())
    return time.time() - t0, rows


def main() -> None:
    from railgun_spark.session import get_spark

    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = [a for a in args if a in QUERIES] or list(QUERIES)

    base = os.environ.get("SPARK_GRAFT_SF4_BASE", "/tmp")
    d1 = os.path.join(base, "sf4probe_k10")
    d4 = os.path.join(base, "sf4probe_k40")
    spark = get_spark("sf4_probe")
    if any(n not in EMB_QUERIES for n in names):
        build_tables(spark, d1, 10)
        build_tables(spark, d4, 40)
    if any(n in EMB_QUERIES for n in names):
        build_embeddings(spark, d1, 10)
        build_embeddings(spark, d4, 40)

    results = {}
    verdicts = []
    for name in names:
        s01, r01 = _time(spark, name, SRC)
        s1, r1 = _time(spark, name, d1)
        s4, r4 = _time(spark, name, d4)
        ratio_10x = s1 / s01 if s01 > 0 else float("inf")
        ratio_4x = s4 / s1 if s1 > 0 else float("inf")
        # data grows 4x between the last two points; 30% slack as in
        # sf1_probe. Bending flat = the 4x leg ratio stays under the
        # 10x leg's per-x rate (it amortized), i.e. clearly sub-n^2.
        bends_flat = ratio_4x <= 4 * 1.3
        if not bends_flat:
            verdicts.append(name)
        results[name] = {
            "sf0.1_s": round(s01, 2), "sf1_s": round(s1, 2),
            "sf4_s": round(s4, 2),
            "ratio_sf1/sf0.1": round(ratio_10x, 2),
            "ratio_sf4/sf1": round(ratio_4x, 2),
            "rows": [r01, r1, r4], "bends_flat": bends_flat,
        }
        print(f"{name:28s} {s01:6.2f}s -> {s1:7.2f}s -> {s4:8.2f}s  "
              f"x{ratio_10x:5.2f} then x{ratio_4x:5.2f} "
              f"{'flat' if bends_flat else 'STEEPENING'}", flush=True)

    line = json.dumps({
        "metric": "sf4_scale_probe", "k_points": [1, 10, 40],
        "queries": results, "steepening": verdicts,
    })
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
