"""Skew-handling operators — salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
these helpers cover the two cases AQE can't: a skewed *aggregation* (one
key owning a large fraction of rows serializes its final combine) and a
skewed *shuffle join* where the hot side must be split deterministically.

Salting trades one extra narrow stage for an even shuffle: at 100 TB a
single hot key (the reference's busiest ticket / a viral user_id) is the
difference between a 10-minute stage and one straggler task running for
hours.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    agg_cols: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(key, salt) partial → groupBy(key)
    final. The salt spreads one hot key over ``salt_buckets`` reducers;
    only decomposable aggregates (sum/count/min/max) are valid here —
    ``agg_cols`` maps output name → the stage-1 aggregate expression, and
    stage 2 re-sums the partials.

    NB: Spark's hash aggregation already does map-side partial combine;
    salting matters when the *final* combine of one key still overloads a
    single reducer (extreme cardinality skew, e.g. count per hour with one
    hour holding half the data).
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*[expr.alias(name) for name, expr in agg_cols.items()])
    )
    return stage1.groupBy(*key_cols).agg(
        *[F.sum(name).alias(name) for name in agg_cols]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed-side salted equi-join: the skewed side gets a random-ish
    (deterministic: hash of all columns) salt in [0, buckets); the other
    side is replicated ``buckets``× via explode. The shuffle key becomes
    (key, salt) — a hot key spreads over ``buckets`` reducers.

    Replication multiplies the small side's shuffle volume by
    ``salt_buckets`` — use only when AQE's runtime skew splitting is
    unavailable (non-sort-merge plans) or insufficient.
    """
    skewed_s = skewed.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)),
    )
    other_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = skewed_s.join(other_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")
