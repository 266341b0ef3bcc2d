"""Join operators (reference §2.3, J1-J7).

The reference performs every join as a Python dict lookup or boolean-mask
semi-join on the driver; here each is a real distributed join with an
explicit strategy choice:

* dimensions (agents/users ≈ nation/supplier) → ``F.broadcast`` hash join:
  no shuffle of the fact side, scales to any fact size as long as the dim
  fits in executor memory (the reference's in-memory caches prove it does).
* large-large equi-joins → shuffle hash/sort-merge on the key, left to
  Catalyst + AQE (skew splitting on hot keys).
* similarity joins → two-phase candidate pruning so the theta-join never
  goes quadratic on the big side (reference's coarse→fine trick,
  core/Geocode.py:55-74, kept as explicit plan structure).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.similarity import (
    char_ngrams,
    jaccard,
    levenshtein_ratio,
)


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """J1: fact ⟕ broadcast(dim) — the reference's dict-lookup enrichment
    (core/TicketMessageProcessor.py:207-292) as a broadcast hash join."""
    return fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], how)


def missing_keys(candidates: DataFrame, known: DataFrame, key: str) -> DataFrame:
    """J2: left-anti join — ids we have not cached yet
    (core/TicketMessageProcessor.py:103-106)."""
    return candidates.join(known, on=key, how="left_anti")


def semi_join(df: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """J4/E2: keep rows whose key appears in ``keys``."""
    return df.join(keys, on=key, how="left_semi")


def correlated_attach(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """J3: the reference fetches messages per ticket and copies ticket
    metadata onto each message row (core/Ticket.py:96-106); relationally
    it's an equi-join child ⋈ parent."""
    return child.join(parent, child[child_key] == parent[parent_key], "inner")


def similarity_join_argmax(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    n: int = 3,
    threshold: float = 0.1,
    keep_right: list[str] | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """J5 + W2: score left×broadcast(right) by n-gram Jaccard, keep the
    argmax candidate per left row if it clears the threshold.

    The reference's geocoder (core/Geocode.py:45-89). The right side MUST be
    a bounded gazetteer-like dimension — it is broadcast, so the plan is a
    single pass over ``left`` with no shuffle until the per-row argmax, which
    is a ``min_by`` aggregation (partial+final, no window sort). For
    self-similarity over an unbounded relation use the LSH path in
    ``operators.dedup`` instead; a broadcast that grows with the fact table
    would OOM at scale.

    ``exclude_self`` drops identical-string pairs before the argmax (the
    reference's geocoder never scores an address against itself;
    core/Geocode.py:74-87 takes the best *other* candidate).

    Deterministic argmax with no SortOrder-in-struct: ``min_by`` on
    ``struct(-score, *keep_right)`` = max score, ties broken by the smallest
    right value (struct comparison is field-by-field ascending).
    """
    keep_right = keep_right if keep_right is not None else [right_col]

    # grams are materialized as columns BEFORE the cross join: computed
    # O(|left|+|right|) in the scan stages instead of O(|left|×|right|)
    # inside the join projection
    l = left.withColumn("__l", F.lower(F.col(left_col))).withColumn(
        "__lg", char_ngrams(F.lower(F.col(left_col)), n)
    )
    r = right.withColumn("__r", F.lower(F.col(right_col))).withColumn(
        "__rg", char_ngrams(F.lower(F.col(right_col)), n)
    )
    scored = l.crossJoin(F.broadcast(r))
    if exclude_self:
        scored = scored.where(F.col("__l") != F.col("__r"))
    scored = scored.withColumn(
        "__score", jaccard(F.col("__lg"), F.col("__rg"))
    ).where(F.col("__score") >= threshold)
    best = F.min_by(
        F.struct(*[F.col(c) for c in keep_right], F.col("__score").alias("score")),
        F.struct((-F.col("__score")).alias("neg"), *[F.col(c) for c in keep_right]),
    )
    group_cols = [F.col(c) for c in left.columns]
    return (
        scored.groupBy(*group_cols)
        .agg(best.alias("__best"))
        .select(*left.columns, "__best.*")
    )


def two_phase_similarity_join(
    addresses: DataFrame,
    gazetteer: DataFrame,
    addr_col: str = "address",
    gaz_col: str = "address",
    coarse_levels: tuple[str, ...] = ("municity", "provdist"),
    level_col: str = "geo_level",
    code_cols: tuple[str, ...] = ("municity_code", "provdist_code"),
    n: int = 5,
    coarse_threshold: float = 0.1,
    threshold: float = 0.1,
) -> DataFrame:
    """The reference geocoder's full two-phase plan (core/Geocode.py:45-89):

    phase 1 (coarse): score each address against only municipality/province
    rows; collect the codes of plausible candidates.
    phase 2 (fine): score against barangay rows *semi-joined* to those codes
    (J4), then argmax ≥ threshold (W2).

    Expressed as explicit plan structure — Catalyst executes each phase as a
    broadcast similarity join; the semi-join keeps phase 2 sub-quadratic.
    The addresses side is scanned twice (coarse + fine) — the textbook
    two-phase tradeoff: two pruned scans of the fact table instead of one
    full cross-product against the whole gazetteer.

    The best match's gazetteer text is returned as ``matched_<gaz_col>``
    (renamed internally so identical addr_col/gaz_col names — both default
    to 'address' — never produce an ambiguous reference).
    """
    out_gaz = f"matched_{gaz_col}"
    gazetteer = gazetteer.withColumnRenamed(gaz_col, out_gaz)
    gaz_col = out_gaz
    addr_cols = list(addresses.columns)
    # grams materialized as columns before the joins (computed per row,
    # not per candidate pair)
    addresses = addresses.withColumn(
        "__ag", char_ngrams(F.lower(F.col(addr_col)), n)
    )
    gazetteer = gazetteer.withColumn(
        "__gg", char_ngrams(F.lower(F.col(gaz_col)), n)
    )
    coarse_dim = gazetteer.where(F.col(level_col).isin(*coarse_levels))
    fine_dim = gazetteer.where(~F.col(level_col).isin(*coarse_levels))

    score = jaccard(F.col("__ag"), F.col("__gg"))

    coarse = (
        addresses.crossJoin(F.broadcast(coarse_dim))
        .withColumn("__score", score)
        .where(F.col("__score") >= coarse_threshold)
    )
    # codes of plausible coarse candidates, per address
    cand_codes = coarse.select(
        addr_col, *[F.col(c) for c in code_cols]
    ).distinct()

    fine_cand = fine_dim.join(
        F.broadcast(cand_codes.select(code_cols[0]).distinct()),
        on=code_cols[0],
        how="left_semi",
    ).unionByName(
        fine_dim.join(
            F.broadcast(cand_codes.select(code_cols[1]).distinct()),
            on=code_cols[1],
            how="left_semi",
        )
    ).distinct()

    fine = (
        addresses.crossJoin(
            F.broadcast(fine_cand.union(coarse_dim.select(fine_cand.columns)))
        )
        .withColumn("__score", score)
        .where(F.col("__score") >= threshold)
    )
    # argmax per address as a min_by aggregation (partial+final combine —
    # no per-address sort; same trick as similarity_join_argmax): best =
    # highest score, ties broken by the smallest matched text
    payload = [
        c for c in fine.columns if c not in (*addr_cols, "__ag", "__gg")
    ]
    best = F.min_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct((-F.col("__score")).alias("neg"), F.col(gaz_col)),
    )
    return (
        fine.groupBy(*[F.col(c) for c in addr_cols])
        .agg(best.alias("__best"))
        .select(*addr_cols, "__best.*")
    )


def fuzzy_threshold_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    threshold: float = 90.0,
    flag_col: str = "viable",
) -> DataFrame:
    """J6/U3: the serviceability tag — best fuzzy score against a broadcast
    list, 'Yes' iff ≥ threshold (utils/geocode_utils.py:16-27).

    fuzzywuzzy's extractOne becomes: broadcast cross-score with a
    Levenshtein ratio, max per left row, then a when/otherwise flag.
    """
    score = levenshtein_ratio(F.lower(F.col(left_col)), F.lower(F.col(right_col)))
    scored = left.crossJoin(F.broadcast(right)).withColumn("__score", score)
    agg = scored.groupBy(*left.columns).agg(F.max("__score").alias("best_score"))
    return agg.withColumn(
        flag_col, F.when(F.col("best_score") >= threshold, "Yes").otherwise("No")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "ts", "value"),
    prefix: str = "right_",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the latest right
    row of the same key with ``right.ts <= left.ts`` — the time-series
    join (trade ← latest quote) Spark has no native operator for, and a
    named gap in the reference (SURVEY §3: "no range/as-of/interval
    joins").

    NOT a range join: a naive ``left.ts >= right.ts`` theta-join
    materializes O(|left|·|right|) pairs per key before the argmax. This
    is the union-and-carry-forward form — tag both sides, union, and run
    ``last(payload, ignorenulls=True)`` over a window ordered by
    (ts, side, tiebreak): each left row picks up the most recent right
    payload carried forward within its key partition. ONE hash shuffle on
    the key columns, linear in |left|+|right|, and the sort is the same
    per-partition sort a SortMergeJoin would do anyway — this is the plan
    shape you want at 100 TB, and it inherits AQE skew splitting on the
    key shuffle.

    Ordering contract: at equal timestamps the right row sorts BEFORE the
    left row (side 0 < 1), so ``right.ts == left.ts`` matches — the
    standard ASOF inclusive bound. Ties BETWEEN right rows at the same
    (key, ts) are broken by ``tiebreak_col`` (default: the first of
    ``right_cols``) taking the maximum, so results are deterministic at
    any parallelism — the property the oracle hash-check needs and
    DuckDB's native ASOF JOIN leaves unspecified.

    Returns every left row + ``prefix``-renamed right payload columns
    (NULL where no right row precedes).
    """
    from .dedup import _require_numeric

    tb = tiebreak_col or right_cols[0]
    # a silent cast('long') on a string id column would null every
    # tiebreak and make same-(key, ts) winners partition-dependent
    _require_numeric(right, (tb,), "asof_join (tiebreak column)")
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r2 = right.select(
        *key_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tb).cast("long").alias("__tb"),
        payload.alias("__pl"),
    )
    payload_t = r2.schema["__pl"].dataType
    l2 = left.select(
        *left.columns,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(payload_t).alias("__pl"),
    )
    # align schemas: right rows carry nulls for left-only columns
    for c in left.columns:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l2.unionByName(r2.select(*l2.columns))

    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__side", F.coalesce(F.col("__tb"), F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__m", F.last("__pl", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("__m")[c].alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.where(F.col("__side") == 1).select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 7,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Interval-containment join: each point row matches every interval
    row with ``start <= point <= end`` (plus equality on ``key_cols`` if
    given) — the other join family the reference lacks (SURVEY §3: "no
    range/as-of/interval joins") and Spark expresses only as a theta
    join, which the planner executes as a (broadcast) nested loop over
    the full cross product.

    Banded form: intervals explode to the coarse buckets they span
    (``sequence(floor(start/w), floor(end/w))``), points hash to exactly
    one bucket, and the join becomes an EQUI-join on (key_cols, bucket)
    followed by the exact BETWEEN filter. Candidate pairs collapse from
    |points|·|intervals| to only bucket-co-located ones — the same
    blocking idea as the LSH band join, applied to 1-D ranges. Each
    matching (point, interval) pair arises in exactly one bucket (the
    point's), so no dedup pass is needed. Pick ``bucket_width`` near the
    typical interval length: ~1-2 exploded rows per interval, and a
    point's bucket holds only nearby intervals. Columns must be integer
    domains (epoch days/seconds); cast timestamps first.

    Returns point rows joined to their containing intervals' columns.
    """
    p = points.withColumn(
        "__rb", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, on=[*key_cols, "__rb"])
        .where(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__rb")
    )
