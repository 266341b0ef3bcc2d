"""Aggregation operators (reference §2.4, A1-A6).

All hash aggregations with map-side partial aggregation — Spark's default.
Money math is done in DECIMAL so results are bit-exact regardless of
partitioning / summation order (a 32-way local sum and a 1000-executor sum
produce the same answer — required for the DuckDB oracle hash-match and,
more importantly, for reproducible pipelines at scale).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Decimal wide enough for sf100k money sums, exact in both Spark and DuckDB.
MONEY = "decimal(12,2)"
RATE = "decimal(12,4)"


def dsum(col: Column, dtype: str = MONEY) -> Column:
    """Order-independent exact sum: cast to decimal before aggregating."""
    return F.sum(col.cast(dtype))


def token_totals_by_model(
    logs: DataFrame,
    start: str,
    end: str,
    ts_col: str = "date_extracted",
    model_col: str = "model",
    token_col: str = "tokens",
) -> DataFrame:
    """A1: ``SELECT model, SUM(tokens) total_tokens WHERE ts in [start,end)
    GROUP BY model`` (core/extract/ExtractionLogger.py:72-83)."""
    return (
        logs.where((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end)))
        .groupBy(model_col)
        .agg(F.sum(token_col).alias("total_tokens"))
    )


def distinct_keys(df: DataFrame, *cols: str) -> DataFrame:
    """A2: DISTINCT projection (extraction_helpers.py:99)."""
    return df.select(*cols).distinct()


def distinct_ids_from_columns(df: DataFrame, cols: list[str], out: str = "id") -> DataFrame:
    """A3: unique ids pooled from several columns
    (core/TicketMessageProcessor.py:24-37) — explode + distinct, one shuffle."""
    exploded = df.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias(out)
    )
    return exploded.where(F.col(out).isNotNull()).distinct()


def ordered_group_concat(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    text_col: str,
    sep: str = "\n\n",
    out: str = "conversation",
) -> DataFrame:
    """A5: per-group concatenation in event order
    (core/extract/ConvoDataExtract.py:189-203).

    Deterministic at any parallelism: collect_list carries the sort keys
    inside a struct, array_sort orders *inside the aggregation result*, then
    the payload is projected out. Never relies on input row order (which a
    shuffle destroys) — SURVEY §7 "hard part (a)".
    """
    sort_struct = F.struct(
        *[F.col(c) for c in order_cols], F.col(text_col).alias("__txt")
    )
    return df.groupBy(group_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(sort_struct)), lambda s: s["__txt"]
            ),
            sep,
        ).alias(out)
    )


def first_row_pick(df: DataFrame, order_col: str, value_cols: list[str]) -> DataFrame:
    """A6: ``iloc[0]`` of a sorted frame (ExtractionLogger.py:81-83) —
    min_by instead of a global sort + limit (no full sort at scale)."""
    return df.select(
        *[
            F.min_by(F.col(c), F.col(order_col)).alias(c)
            for c in value_cols
        ]
    )
