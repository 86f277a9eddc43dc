"""Bucketed co-located fact-fact join probe: measure the shuffle
elimination that pre-bucketing buys for the workhorse orders<->lineitem
join — the pattern that matters most at 100 TB, where re-shuffling both
fact tables on every join is the dominant cost of a star-schema
workload.

Both facts are written as bucketed+sorted tables on the join key
(bucketBy N orderkey, sortBy orderkey). A join between them then scans
the co-located buckets in place: ZERO Exchange nodes feed the
SortMergeJoin (and with sorted buckets, zero Sort nodes too), versus
two full shuffles for the plain parquet join. Broadcast is disabled for
the probe so the comparison is shuffle-join vs bucket-join, not
broadcast luck at toy scale; at 100 TB neither side broadcasts.

Prints one JSON line:
  {"metric": "bucketed_join_probe", "buckets": N,
   "plain": {"exchanges_before_join": 2, "sec": ...},
   "bucketed": {"exchanges_before_join": 0, "sec": ...},
   "join_rows": R, "ok": true}
ok = the bucketed join really had zero pre-join exchanges.

Usage: python tools/bucketed_join_probe.py [n_buckets]  (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _join(li, orders):
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _pre_join_exchanges(df) -> int:
    """Exchange nodes BELOW the first SortMergeJoin in the executed plan
    string — the shuffles the join itself forces (the post-agg exchange
    is excluded; both variants share it)."""
    df.collect()  # execute so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final AND Initial plans; count only the final one
    plan = plan.split("== Initial Plan ==")[0]
    lines = plan.splitlines()
    join_at = next((i for i, line in enumerate(lines)
                    if "SortMergeJoin" in line), None)
    if join_at is None:
        raise RuntimeError("probe expects a SortMergeJoin in both plans")
    return sum(1 for line in lines[join_at:] if "Exchange" in line)


def main() -> None:
    from railgun_spark.session import get_spark

    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("bucketed_join_probe")
    # force the shuffle-join comparison: no broadcast, no AQE plan swap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )

    t0 = time.time()
    plain_df = _join(li, orders)
    plain_ex = _pre_join_exchanges(plain_df)
    t_plain = time.time() - t0

    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name in ("probe_li_bucketed", "probe_orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a table dir orphaned by a crashed prior run blocks saveAsTable
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
    li.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("probe_li_bucketed")
    orders.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("probe_orders_bucketed")

    li_b = spark.table("probe_li_bucketed")
    orders_b = spark.table("probe_orders_bucketed")
    t0 = time.time()
    bucketed_df = _join(li_b, orders_b)
    bucket_ex = _pre_join_exchanges(bucketed_df)
    t_bucket = time.time() - t0

    rows = {tuple(r) for r in plain_df.collect()}
    rows_b = {tuple(r) for r in bucketed_df.collect()}
    out = {
        "metric": "bucketed_join_probe",
        "sf_dir": SF_DIR,
        "buckets": n_buckets,
        "plain": {"exchanges_before_join": plain_ex, "sec": round(t_plain, 2)},
        "bucketed": {"exchanges_before_join": bucket_ex, "sec": round(t_bucket, 2)},
        "results_match": rows == rows_b,
        "ok": bucket_ex == 0 and rows == rows_b,
    }
    print(json.dumps(out))
    for name in ("probe_li_bucketed", "probe_orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


if __name__ == "__main__":
    main()
