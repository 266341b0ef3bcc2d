"""Parquet table catalog.

Reference counterpart: ``core/BigQueryManager.py:116-123`` (``sql_query_bq``)
and ``core/extract/Extractor.py:178-198`` (``fetch_bq_table``) — the
reference's "catalog" is a BigQuery dataset it queries with f-string SQL.
Here tables are Parquet directories; ``spark.read.parquet`` gives vectorized
scans with predicate pushdown and column pruning, so every downstream
``.select``/``.where`` reaches the file footer (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``).

At 100 TB these would be date-partitioned (hive-style ``dt=`` dirs) or Delta
tables; the loaders keep that swap localized to this module.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that the reference kept as in-memory dict caches
# (core/Ticket.py:24, core/TicketMessageProcessor.py:21-22). In Spark the
# equivalent is "always on the broadcast side of a join".
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Lazy; no IO until an action runs."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> None:
    """Register every table as a temp view so ``spark.sql`` plans against
    them (reference op S6: arbitrary warehouse SQL)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
