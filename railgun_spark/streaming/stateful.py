"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only cross-request state is the service-variable cache
(railgun/handlers/ServiceExecHandler.go:282-290) and TTL data caches
(railgun/cache/Cache.go:25-75) — there are no stateful stream operators to
mirror (SURVEY §2.10), so these are engine-superset components built the
idiomatic Structured Streaming way:

- `running_user_totals`: per-key running count/sum maintained in the state
  store across micro-batches (the streaming twin of a cumulative window).
- `streaming_dedup_first_seen`: emit only the first occurrence of each
  (key, content-hash) — exact dedup over an unbounded stream with the seen
  set held in per-key state.

Scale notes: state lives in the executor state store partitioned by the
grouping key, so memory scales with distinct keys per executor, not stream
length; for the dedup operator the held state is the hash set (8 bytes/doc
effective), the canonical trade for exact streaming dedup. Watermark-based
state TTL applies when the caller keys by a time bucket.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_RUNNING_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) across micro-batches.

    Emits one row per key per batch with the updated running totals."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_RUNNING_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("content_hash", T.LongType()),
    ]
)

_DEDUP_STATE = T.StructType([T.StructField("seen", T.ArrayType(T.LongType()))])


def streaming_dedup_first_seen(events: DataFrame) -> DataFrame:
    """Exact streaming dedup: first event per (user, content hash) passes,
    later duplicates are dropped — the unbounded twin of
    `dedup.dedup_exact_keep_first`. Input needs a `content_hash` column."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen_list,) = state.get if state.exists else ([],)
        seen = set(seen_list or [])
        # concat BEFORE sorting: a group spanning multiple Arrow chunks must
        # pick min(event_id) per hash across the whole micro-batch, not per
        # chunk — and vectorized pandas, never per-row iterrows
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("event_id", kind="mergesort")
            fresh = pdf[~pdf["content_hash"].isin(seen)].drop_duplicates(
                "content_hash", keep="first"
            )
            seen.update(int(h) for h in fresh["content_hash"])
            out = fresh[["user_id", "event_id", "content_hash"]]
        else:
            out = pdf
        state.update((sorted(seen),))
        yield out

    return (
        events.select("user_id", "event_id", "content_hash")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=DEDUP_SCHEMA,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
