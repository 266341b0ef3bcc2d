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

    # fold the sequential recurrence as column expressions: t0 = earliest
    # step-0 event; t_k = earliest step-k event in (t_{k-1}, t_{k-1}+W].
    # F.get (0-based) is the null-on-missing element read — element_at
    # THROWS on an empty array under ANSI mode. The filter lambdas take
    # exactly ONE parameter: a second one would silently bind the array
    # index (the (element, index) HOF form).
    t_prev = F.get(F.col("__ts_0"), 0)
    reach = [t_prev]
    for i in range(1, len(steps)):
        lo = t_prev
        if within_seconds is not None:
            hi = F.timestamp_seconds(
                F.unix_timestamp(t_prev) + within_seconds
            )
            cand = F.filter(
                F.col(f"__ts_{i}"), lambda x: (x > lo) & (x <= hi)
            )
        else:
            cand = F.filter(F.col(f"__ts_{i}"), lambda x: x > lo)
        t_prev = F.get(cand, 0)
        reach.append(t_prev)
    reached = per_user.select(
        *[r.isNotNull().cast("long").alias(f"__r{i}") for i, r in enumerate(reach)]
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

    Plan: first-seen week is a groupBy(user) MIN; activity weeks are the
    distinct (user, week) projection; one join on the user key (both
    sides already hash-partitioned by user, so the join reuses the
    aggregation's exchange) and a final count-distinct rollup at
    (cohort, week_no) cardinality — weeks², not events."""
    week = F.date_trunc("week", F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(week).alias("cohort_week"))
    active = df.select(user_col, week.alias("__w")).distinct()
    j = active.join(first, user_col)
    week_no = (
        (F.unix_timestamp("__w") - F.unix_timestamp("cohort_week"))
        / (7 * 86400)
    ).cast("long")
    return (
        j.select("cohort_week", week_no.alias("week_no"), F.col(user_col))
        .groupBy("cohort_week", "week_no")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )
