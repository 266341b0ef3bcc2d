"""Window / sort / limit / top-k operators (reference §2.5, W1-W4).

The reference's only window-shaped computation is the geocoder argmax (W2).
A real engine needs the full family, so ranking / lag-lead / frame windows
are provided as first-class helpers; each is a single Spark window spec —
one shuffle on the partition key, sort within partitions only (never a
global sort unless explicitly asked for).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int = 1,
    rank_col: str = "rn",
) -> DataFrame:
    """W2 generalized: row_number over (partition, order) ≤ k.

    Pass a total order (include a unique tiebreaker) for deterministic
    output. At scale this is the canonical per-key top-k: one hash shuffle,
    in-partition sort, early-out filter."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def argmax(
    df: DataFrame, group_cols: list[str], score_col: str, payload_cols: list[str]
) -> DataFrame:
    """W2 as an aggregation: max_by avoids the window sort entirely —
    partial aggregation keeps only the best candidate per key per partition
    (the 100 TB-friendly form of 'sort desc, take iloc[0]',
    core/Geocode.py:74-87)."""
    tie = F.struct(F.col(score_col), *[F.col(c) for c in payload_cols])
    best = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols], F.col(score_col)), tie
    )
    return df.groupBy(*group_cols).agg(best.alias("__best")).select(
        *group_cols, "__best.*"
    )


def ordered_limit(df: DataFrame, order_by: list[Column], n: int) -> DataFrame:
    """W1+W3: ORDER BY … LIMIT n — Spark plans TakeOrderedAndProject
    (per-partition top-n + merge on driver), not a global sort."""
    return df.orderBy(*order_by).limit(n)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    session_col: str = "session_no",
) -> DataFrame:
    """Batch gap-based sessionization: rows for a key belong to the same
    session while consecutive timestamps are ≤ ``gap_seconds`` apart; a
    larger gap opens the next session. ``session_col`` numbers sessions
    1..n per key in time order.

    Classic lag + running-sum-of-boundaries algebra: ONE hash shuffle on
    ``key_col`` plus an in-partition sort (exactly what a sort-merge join
    pays), and both window passes share the same partitioning/ordering so
    Catalyst plans a single Window node chain with no second exchange.
    Downstream per-(key, session) aggregation also reuses the partitioning
    (HashPartitioning(key) satisfies the grouped distribution on the
    superset key), so a sessionize → session-stats pipeline is one shuffle
    end-to-end at any scale. Pass ``tiebreak_col`` (a unique id) when
    timestamps can tie so session numbering is deterministic."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    # microsecond-exact gap: unix_timestamp() truncates fractional
    # seconds, which would session events 3600.9 s apart together at
    # gap_seconds=3600 — the same truncation bug the funnel fix rejected
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    boundary = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        session_col, F.sum(boundary).over(running).cast("long")
    )


def lag_lead_delta(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Sessionization primitive: previous value/timestamp per key —
    foundation for the streaming session-window oracle and gap analysis."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    return df.withColumn("prev_value", F.lag(value_col).over(w)).withColumn(
        "prev_ts", F.lag(order_col).over(w)
    )
