"""Set operators (reference §2.6, E1-E4) and the run-metrics accounting
built on them (core/extract/ExtractionLogger.py:95-123).

The reference materializes both id sets on the driver and uses Python set
algebra; here they are anti/semi joins — distributed, no driver collect.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def except_keys(run: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """E1: run − existing (new rows this run)."""
    return run.join(existing, on=key, how="left_anti")


def intersect_keys(run: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """E2: run ∩ existing (rows that will be updated)."""
    return run.join(existing, on=key, how="left_semi")


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """E3: vertical concat by column name (extraction_helpers.py:218-226)."""
    return reduce(DataFrame.unionByName, dfs)


def new_vs_existing_counts(
    run: DataFrame, existing: DataFrame, key: str
) -> DataFrame:
    """ExtractionLogger.calculate_metrics: one pass, one join — tag each run
    key as new/existing and aggregate, instead of two driver-side set ops."""
    tagged = (
        run.select(key)
        .distinct()
        .join(
            existing.select(key).distinct().withColumn("__known", F.lit(1)),
            on=key,
            how="left",
        )
    )
    return tagged.agg(
        F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0)).alias("n_new"),
        F.sum(F.when(F.col("__known").isNotNull(), 1).otherwise(0)).alias(
            "n_existing"
        ),
        F.count(F.lit(1)).alias("n_total"),
    )
