"""Benchmark harness: runs the headline suite queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "top_orders_by_revenue",
    "region_nation_revenue",
    "revenue_range_filter",
    "window_topk_per_group",
    "hist_nested",
    "word_hist_topk",
    "dedup_minhash_lsh",
    "knn_brute_force",
    "ann_ivf_topk",
    "geo_tile_hist",
    "tumbling_window_counts",
    "sessionize_events",
    "range_join_event_bursts",
    "cube_lineitem_flags",
    "multimodal_features",
]


def main():
    from railgun_spark import suite
    from railgun_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("railgun_spark_bench")
    qs = suite.all_queries()  # includes locally-gated extras (revenue_range_filter)

    # warm the JVM + file listing with the cheapest query, untimed
    qs["pricing_summary"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
