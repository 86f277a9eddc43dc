"""Sketch-based approximate aggregation: the 100 TB answer when exact
global aggregation is the bottleneck.

Exact distinct-count and exact percentiles both need every value in one
place (a full shuffle of the key domain, or per-group value buffering).
The sketch versions are MERGEABLE partials — each partition builds a
fixed-size summary, partials combine associatively map-side, and the
final merge is bytes-per-partition, not rows: the same partial-aggregate
shape Catalyst already uses for sum/count. That is why they are the only
viable form at PB scale, and why every wrapper here is a thin veneer
over a JVM-side built-in (HyperLogLog++ for distinct, Greenwald-Khanna
for quantiles, the Karp-Papadimitriou-Shenker one-pass heavy-hitter scan
behind df.stat.freqItems): no Python in the data path at all.

Error contracts (tolerance-tested in tests/test_dedup_similarity.py):
- approx_distinct: relative standard deviation `rsd` (default 2.3%)
- approx_quantiles: rank error `accuracy` (1/accuracy relative rank)
- frequent_items: returns a SUPERSET of items with frequency > support
  (false positives possible, false negatives not — filter exactly
  downstream if needed; the candidate set is small by construction)

Exact twins for each live in the suite (`profile_orders_columns`,
`revenue_percentiles`, `window_topk_salted`) — the sketches trade their
shuffles for bounded error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None, rsd: float = 0.023
) -> DataFrame:
    """(group..., approx_distinct) via HyperLogLog++ partials."""
    agg = F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    group_cols: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """(group..., q_<p>...) via mergeable Greenwald-Khanna sketches; rank
    error <= 1/accuracy. One map-side-combined aggregation, no per-group
    value buffering."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> list:
    """Single-pass heavy-hitter candidates with frequency > support
    (KPS one-pass algorithm; superset guarantee, no false negatives)."""
    row = df.stat.freqItems([col], support).collect()[0]
    return sorted(row[f"{col}_freqItems"])
