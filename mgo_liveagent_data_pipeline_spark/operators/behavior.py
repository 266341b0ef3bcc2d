"""Event-behavior analytics — funnel conversion and retention cohorts.

The product-analytics queries every event warehouse runs (the reference's
events are helpdesk interactions; the same shapes apply to any
user × timestamp × type stream). Both operators are single-aggregation
formulations: the per-user event sequence collapses to a handful of
scalars/arrays in ONE hash shuffle on the user key — never a per-user
sort-and-iterate, never a driver-side loop.

Determinism: timestamps compare exactly; per-user arrays are reduced by
``array_min``-style order-free operations, so results hash-match the
DuckDB oracle at any parallelism.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion: for each user, step k counts as reached
    iff an event of type ``steps[k]`` occurs strictly after the user's
    step-(k−1) time (and within ``within_seconds`` of it, when given);
    step times are the EARLIEST qualifying occurrence (the standard
    product-analytics semantics). Returns one row per step:
    (step_no, step, n_users) with n_users monotonically non-increasing.

    Plan: ONE groupBy(user) collecting, per step type, the user's sorted
    timestamp list; the sequential "earliest after previous" recurrence
    then runs as array expressions over those per-user lists (array_sort
    + filter + element_at — interpreted, but over per-user-cardinality
    arrays, not the corpus). One corpus shuffle total; the per-step
    rollup aggregates |users| narrow rows. Skew note: a user's array is
    their event count for the step types only — cap upstream if a bot
    user can own millions of events.
    """
    tses = [
        F.array_sort(
            F.collect_list(
                F.when(F.col(type_col) == s, F.col(ts_col))
            )
        ).alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(user_col).agg(*tses)

    # fold the sequential recurrence one projection per step: t0 =
    # earliest step-0 event; t_k = earliest step-k event in
    # (t_{k-1}, t_{k-1}+W]. Each step's time is materialized as a real
    # column (withColumn) so step k references an ATTRIBUTE, not an
    # inlined copy of the whole t_{k-1} expression — inlining grows the
    # tree ~2^k with funnel length and blows up codegen past ~10 steps.
    # F.get (0-based) is the null-on-missing element read — element_at
    # THROWS on an empty array under ANSI mode. The filter lambdas take
    # exactly ONE parameter: a second one would silently bind the array
    # index (the (element, index) HOF form). The window upper bound adds
    # a make_interval — NOT unix_timestamp arithmetic, which truncates
    # t_{k-1} to whole seconds and shrinks the window by the fractional
    # part (a real divergence vs the oracle's INTERVAL arithmetic on
    # microsecond-precision event timestamps).
    # helper so each lambda stays SINGLE-parameter (PySpark counts
    # parameters — including defaults — to pick the HOF arity) while
    # binding this iteration's lo/hi by closure
    def _after(arr, lo, hi):
        if hi is None:
            return F.filter(arr, lambda x: x > lo)
        return F.filter(arr, lambda x: (x > lo) & (x <= hi))

    cur = per_user.withColumn("__t0", F.get(F.col("__ts_0"), 0))
    for i in range(1, len(steps)):
        lo = F.col(f"__t{i - 1}")
        hi = (
            lo + F.make_interval(secs=F.lit(within_seconds))
            if within_seconds is not None
            else None
        )
        cand = _after(F.col(f"__ts_{i}"), lo, hi)
        cur = cur.withColumn(f"__t{i}", F.get(cand, 0))
    reached = cur.select(
        *[
            F.col(f"__t{i}").isNotNull().cast("long").alias(f"__r{i}")
            for i in range(len(steps))
        ]
    )
    agg = reached.agg(
        *[F.sum(f"__r{i}").alias(f"__n{i}") for i in range(len(steps))]
    )
    # one explode over the single aggregate row — a per-step union of
    # selects would re-evaluate the whole aggregation once per branch
    structs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_no"),
                F.lit(s).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return agg.select(F.explode(structs).alias("r")).select("r.*")


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted distinct in each subsequent activity week.
    Returns (cohort_week, week_no, n_users) where week_no 0 is the
    cohort week itself.

    Plan: ONE groupBy(user) produces both the first-seen week (MIN) and
    the distinct activity-week set (collect_set) — no separate distinct
    projection, no join, so the whole per-user phase rides a single
    user-key shuffle; exploding the week set yields |user-weeks| narrow
    rows into the final count-distinct rollup at (cohort, week_no)
    cardinality. week_no is a calendar-day difference (datediff // 7),
    NOT epoch-second arithmetic: both buckets are week-truncated
    Mondays, so day math is exact, and it stays correct in non-UTC
    session timezones where a DST-transition week is not 604800 s
    long."""
    week = F.date_trunc("week", F.col(ts_col))
    per_user = df.groupBy(user_col).agg(
        F.min(week).alias("cohort_week"),
        F.collect_set(week).alias("__ws"),
    )
    j = per_user.select(
        user_col, "cohort_week", F.explode("__ws").alias("__w")
    )
    week_no = (F.datediff(F.col("__w"), F.col("cohort_week")) / 7).cast(
        "long"
    )
    return (
        j.select("cohort_week", week_no.alias("week_no"), F.col(user_col))
        .groupBy("cohort_week", "week_no")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )
