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


def _row_salt(salt_buckets: int) -> Column:
    """Per-row salt in [0, salt_buckets) that (a) varies WITHIN an input
    partition — so a hot key spreads even when the input arrives clustered
    by that key (one partition = one key, what a prior
    repartitionByRange(key) write produces) — and (b) reads NO data
    columns. It derives from ``monotonically_increasing_id()``
    (partition_id << 33 | row_offset), whose per-partition row offset
    cycles through every bucket. An earlier row-content-hash salt had
    property (a) but not (b): hashing every column defeated column
    pruning, turning a 2-column aggregation scan into a full-width scan —
    the exact anti-pattern the plan auditor flags. The salt only routes
    rows to stage-1 partials; results are salt-invariant, so layout
    dependence is harmless.

    Known trade, documented: the expression is NONDETERMINISTIC, so
    Catalyst will not push later predicates below the salt projection —
    filters that must reach the scan (join-key IsNotNull, caller
    predicates) have to be applied BEFORE salting. ``salted_join`` does
    exactly that for the null-key filter its join implies."""
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    agg_cols: dict[str, Column],
    salt_buckets: int = 16,
    recombine: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-stage aggregation: groupBy(key, salt) partial → groupBy(key)
    final. The salt spreads one hot key over ``salt_buckets`` reducers;
    only decomposable aggregates are valid here — ``agg_cols`` maps output
    name → the stage-1 aggregate expression. Stage 2 re-combines partials
    with ``F.sum`` by default (correct for sum/count); for min/max pass the
    matching stage-2 aggregate in ``recombine`` (e.g.
    ``{"max_v": F.max("max_v")}``) — re-summing per-salt maxima would be
    silently wrong.

    NB: Spark's hash aggregation already does map-side partial combine;
    salting matters when the *final* combine of one key still overloads a
    single reducer (extreme cardinality skew, e.g. count per hour with one
    hour holding half the data).

    The salt (``_row_salt``) varies per row WITHIN a partition, NOT
    spark_partition_id(): a partition id is constant within an input
    partition, so an input already clustered by the hot key — exactly what
    a prior repartitionByRange(key) write produces — would put every row
    of that key in one salt bucket and spread nothing. And it reads no
    data columns, so the scan stays pruned to key + aggregated columns.
    """
    recombine = recombine or {}
    unknown = set(recombine) - set(agg_cols)
    if unknown:
        raise ValueError(f"recombine names not in agg_cols: {sorted(unknown)}")
    salt = _row_salt(salt_buckets).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*[expr.alias(name) for name, expr in agg_cols.items()])
    )
    return stage1.groupBy(*key_cols).agg(
        *[
            recombine.get(name, F.sum(name)).alias(name)
            for name in agg_cols
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed-side salted equi-join: the skewed side gets a per-row salt
    (``_row_salt`` — varies within a partition, reads no data columns) in
    [0, buckets); the other side is replicated ``buckets``× via explode.
    The shuffle key becomes (key, salt) — a hot key spreads over
    ``buckets`` reducers.

    Replication multiplies the small side's shuffle volume by
    ``salt_buckets`` — use only when AQE's runtime skew splitting is
    unavailable (non-sort-merge plans) or insufficient.

    Only joins that preserve at most the *skewed* side are allowed: with a
    right/full (or other ``other``-preserving) join, unmatched ``other``
    rows would surface once per replica — ``salt_buckets`` duplicates.

    Because the salt expression is nondeterministic, Catalyst cannot push
    the join's implied ``IsNotNull(key)`` below the salt projection — so
    for null-discarding joins (inner/semi) the null-key filter is applied
    HERE, before salting, restoring the pushed scan filter the plain join
    would have had. Null-preserving joins (left/anti) keep their null-key
    rows: they never match anyway, and dropping them would change the
    result.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got how={how!r} — "
            "an other-preserving join would duplicate unmatched rows "
            "salt_buckets times"
        )
    if how in {"inner", "left_semi", "leftsemi", "semi"}:
        skewed = skewed.where(F.col(key).isNotNull())
    skewed_s = skewed.withColumn("__salt", _row_salt(salt_buckets))
    other_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = skewed_s.join(other_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")
