"""Relational query registry — one entry per reference operator from
SURVEY.md §2.1-2.7, expressed on the driver's TPC-H-ish tables.

Each ``q_*`` takes (spark, sf_dir) → DataFrame; ``ORACLES[name]`` is the
ANSI-SQL equivalent DuckDB runs on the same parquet. Column names/types are
aligned on both sides (the correctness gate hashes values under sorted
column names).

Determinism notes (hold at any parallelism / cluster size):
* money sums are computed in DECIMAL (order-independent), surfaced as DOUBLE;
* every top-k / argmax carries a unique tiebreaker;
* ordered group-concat sorts inside the aggregation (never input order).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetimes import fuse_schedule, to_iso, to_manila, tumbling_6h_bucket
from ..functions.jsons import json_get
from ..functions.strings import extract_reference_code, normalize_location, resolve_name
from ..operators.aggregations import (
    distinct_ids_from_columns,
    first_row_pick,
    ordered_group_concat,
)
from ..operators.joins import (
    broadcast_enrich,
    fuzzy_threshold_join,
    missing_keys,
    semi_join,
    similarity_join_argmax,
)
from ..operators.setops import new_vs_existing_counts, union_all
from ..operators.windows import lag_lead_delta, ordered_limit, top_k_per_group
from ..sources.tables import load_table

MONEY = "decimal(12,2)"
RATE = "decimal(12,4)"

# fixed 6-hour window inside the events table's span (2024-01-01..30)
WIN_START = "2024-01-10 00:00:00"
WIN_END = "2024-01-10 06:00:00"


# --------------------------------------------------------------- S: scans
def q_s6_sql_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: arbitrary warehouse SQL executed natively (sql_query_bq,
    core/BigQueryManager.py:116-123)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               cast(round(sum(cast(o_totalprice AS decimal(12,2))), 2) AS double)
                   AS total_value
        FROM v_orders GROUP BY o_orderstatus
        """
    )


def q_s7_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: table preview — LIMIT n (made deterministic with an ORDER BY;
    fetch_bq_table, core/extract/Extractor.py:178-198)."""
    orders = load_table(spark, sf_dir, "orders")
    return ordered_limit(orders, [F.asc("o_orderkey")], 10)


# --------------------------------------------- P: projections / predicates
def q_p2_project_cast_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: SELECT DISTINCT CAST(id AS STRING), … WHERE id IN (…) AND id IS
    NOT NULL (core/TicketMessageProcessor.py:68-74)."""
    cust = load_table(spark, sf_dir, "customer")
    wanted = [str(i) for i in range(0, 200, 7)]
    return (
        cust.select(
            F.col("c_custkey").cast("string").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .where(F.col("id").isin(wanted) & F.col("id").isNotNull())
        .distinct()
    )


def q_p3_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: trailing-window scan — WHERE ts >= start AND ts < end, project id
    cols (recent_tickets, extraction_helpers.py:80-121). The range
    predicate is applied to the column in its native physical type so it
    pushes to the parquet footer (row-group pruning; see
    load_events_window)."""
    from ..sources.tables import load_events_window

    events = load_events_window(spark, sf_dir, WIN_START, WIN_END)
    return events.select("event_id", "user_id", "event_type")


def q_p4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: two-predicate equality filter (message_type='M' AND
    message_format='T', core/extract/ConvoDataExtract.py:191-197)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


def q_p6_p10_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P10+P11: null-fill by dtype, field whitelist, metadata sweep
    (utils/df_utils.py:9-25, extraction_helpers.py:132-146)."""
    events = load_table(spark, sf_dir, "events")
    whitelist = ["event_id", "user_id", "event_type", "value"]
    kept = events.select(
        *[c for c in whitelist if "metadata" not in c.lower()]
    )
    return kept.na.fill({"event_type": "", "value": 0.0})


def q_p8_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: add derived columns (the reference stamps datetime_extracted;
    here derivations are data-dependent so the oracle can reproduce them)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        (F.col("o_totalprice").cast(MONEY) * F.lit(2).cast("decimal(2,0)"))
        .cast("double")
        .alias("double_price"),
    )


# ----------------------------------------------------------------- J: joins
def q_j1_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast dimension enrichment — revenue per nation/region
    (the dict-lookup joins of TicketMessageProcessor.py:207-292)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    enriched = broadcast_enrich(
        broadcast_enrich(cust, nation, "c_nationkey", "n_nationkey"),
        region,
        "n_regionkey",
        "r_regionkey",
    )
    joined = orders.join(
        enriched, orders.o_custkey == enriched.c_custkey, "inner"
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.col("r_name").alias("region")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(MONEY)), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


def q_j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/E1: left-anti — customers with no completed ('F') order
    (cache-miss set, TicketMessageProcessor.py:103-106). Restricted to
    F-status so the miss set is non-empty at every SF (every customer has
    *some* order in this data — an unrestricted anti-join checks nothing)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    misses = missing_keys(cust, orders, "o_custkey")
    return misses.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers_without_orders")
    )


def q_j3_correlated_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: child rows carry parent metadata (message.update(ticket_metadata),
    core/Ticket.py:96-106) — equi-join lineitem ⋈ orders."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    from ..operators.joins import correlated_attach

    return correlated_attach(li, orders, "l_orderkey", "o_orderkey").select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderpriority", "o_orderstatus"
    )


def q_j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/E2: semi-join pruning — orders of AUTOMOBILE-segment customers."""
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    autos = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    return (
        semi_join(orders, autos, "c_custkey")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_j5_similarity_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5+W2: n-gram Jaccard similarity join with per-row argmax ≥ threshold
    (the geocoder join, core/Geocode.py:45-89) — most similar *other* part
    name for every distinct part name."""
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    other = names.select(F.col("p_name").alias("match_name"))
    out = similarity_join_argmax(
        names,
        other.where(F.col("match_name").isNotNull()),
        "p_name",
        "match_name",
        n=3,
        threshold=0.1,
        exclude_self=True,
    )
    return out.select(
        "p_name", "match_name", F.round(F.col("score"), 6).alias("score")
    )


def q_j6_fuzzy_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6+F5+U3: fuzzy threshold tag — best Levenshtein ratio of each part
    name against the part-type vocabulary, 'Yes' iff ≥ 40
    (viability tagging, utils/geocode_utils.py:16-27)."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    types = load_table(spark, sf_dir, "part").select("p_type").distinct()
    out = fuzzy_threshold_join(names, types, "p_name", "p_type", threshold=40.0)
    return out.select(
        "p_name", F.round(F.col("best_score"), 6).alias("best_score"), "viable"
    )


def q_j7_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: positional (zip) join — the reference aligns enrichment rows to
    source rows by position, ``pd.concat(axis=1)`` (core/extract/
    Extractor.py:290-291). Spark rows carry no order, so the alignment key
    is made explicit: row_number over a stated total order on each side,
    then an equi-join on it. A global row_number is a single-partition
    sort — acceptable only for the bounded enrichment frames the reference
    zips; at scale the replacement is the keyed equi-join the pipelines
    use (ticket_id carried through enrichment, SURVEY §2.3 J7)."""
    from pyspark.sql.window import Window

    nation = load_table(spark, sf_dir, "nation")
    w = Window.orderBy("n_nationkey")
    left = nation.select(
        F.row_number().over(w).alias("rn"), "n_name"
    )
    right = nation.select(
        F.row_number().over(w).alias("rn"), "n_regionkey"
    )
    return left.join(right, on="rn").select("rn", "n_name", "n_regionkey")


# ------------------------------------------------------- A: aggregations
def q_a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (flagship): grouped sums/averages/counts — the token-accounting
    aggregate (ExtractionLogger.py:72-83) at TPC-H Q1 shape. DECIMAL sums →
    bit-exact at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(MONEY)
    price = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast(RATE)
    tax = F.col("l_tax").cast(RATE)
    disc_price = price * (F.lit(1).cast(RATE) - disc)
    charge = disc_price * (F.lit(1).cast(RATE) + tax)
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_qty"
            ),
            F.round(F.sum(price).cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_price"
            ),
        )
    )
    return out


def q_a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: DISTINCT projection (extraction_helpers.py:99)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


def q_a3_multi_column_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: unique ids pooled from several columns
    (TicketMessageProcessor.py:24-37)."""
    li = load_table(spark, sf_dir, "lineitem")
    return distinct_ids_from_columns(li, ["l_partkey", "l_suppkey"], out="id")


def q_a5_ordered_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-key conversation assembly in event order
    (ConvoDataExtract.py:189-203)."""
    events = load_table(spark, sf_dir, "events")
    return ordered_group_concat(
        events,
        "user_id",
        ["ts", "event_id"],
        "event_type",
        sep="|",
        out="event_stream",
    )


def q_a6_first_row_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: iloc[0] of a sorted frame → min_by (ExtractionLogger.py:81-83)."""
    orders = load_table(spark, sf_dir, "orders")
    return first_row_pick(orders, "o_orderkey", ["o_totalprice", "o_orderstatus"])


# ------------------------------------------------ W: windows / sort / limit
def q_w2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 generalized: top-3 orders per priority by value (argmax family,
    core/Geocode.py:74-87)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("long"))


def q_w3_ordered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W3: ORDER BY … LIMIT n (TakeOrderedAndProject — no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return ordered_limit(
        orders.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        10,
    )


def q_w5_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: 7-day rolling revenue per priority —
    rangeBetween(-6, 0) over day numbers. DECIMAL inside the frame sum
    keeps it order-independent; one shuffle on the partition key."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("day_no"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(MONEY)).alias("day_total"))
    )
    w = Window.partitionBy("priority").orderBy("day_no").rangeBetween(-6, 0)
    return daily.select(
        "priority",
        "day_no",
        F.round(F.sum("day_total").over(w), 2)
        .cast("double")
        .alias("rolling_7d"),
    )


def q_a7_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set family: ROLLUP(status, priority) with subtotal and
    grand-total rows (beyond the reference — no cube/rollup there), plus
    an exact per-group median (the corpus-stats aggregate a training
    pipeline reports). Cross-engine exactness: the median interpolates at
    most halfway between two order statistics, so it is computed on
    cent-scaled integers — (a+b)/2 on integers < 2^53 is exact in IEEE
    doubles under either engine's interpolation formula, where a raw
    double percentile can differ by one ulp right at a rounding boundary
    (a p95's fractional weight re-introduces that ulp: measured one cent
    off at sf0.01, which is why only the median ships here).

    The cent median is exactly k or k+0.5, so HALF_UP-to-cent is done
    explicitly as floor(cents + 0.5) — bit-exact on both engines — and
    only then divided by 100 (the same IEEE double division both sides).
    round(percentile/100, 2) instead hits the engines' round() divergence
    on the x.xx5 boundary: Spark HALF_UPs the decimal string (1.005 →
    1.01), DuckDB rounds the binary double (1.00499… → 1.00)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("double")
    p50_cents = F.floor(F.percentile(cents, F.lit(0.5)) + F.lit(0.5))
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(MONEY)), 2)
            .cast("double")
            .alias("total_value"),
            (p50_cents.cast("double") / 100).alias("p50_value"),
        )
    )


def q_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: groupBy(key, salt) partial → groupBy(key)
    final (operators/skew.py:salted_sum). The oracle is the PLAIN group-by
    — a hash match proves salting is algebra-invariant for decomposable
    aggregates at any parallelism."""
    from ..operators.skew import salted_sum

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_sum(
        li,
        ["l_returnflag"],
        {
            "sum_qty": F.sum(F.col("l_quantity").cast(MONEY)),
            "n_rows": F.count(F.lit(1)),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("sum_qty"), 2).cast("double").alias("sum_qty"),
        "n_rows",
    )


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join: hot side salted, dim side replicated bucket-times
    (operators/skew.py:salted_join); shuffle key (key, salt) spreads a hot
    orderkey over 8 reducers. Oracle is the plain equi-join + aggregate —
    salting must not change join semantics."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus"
    )
    joined = salted_join(li, orders, "okey", salt_buckets=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice").cast(MONEY)), 2)
        .cast("double")
        .alias("total_price"),
    )


def q_w4_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead family: per-user previous event value and gap seconds."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = lag_lead_delta(events, "user_id", "ts", "value")
    return out.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.col("prev_value"), 6).alias("value_delta"),
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
        .cast("long")
        .alias("gap_seconds"),
    )


def q_w6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py:asof_join): odd event_ids play
    trades, even play quotes — each trade attaches the latest same-user
    quote with quote.ts <= trade.ts. Driver-visible via the ``asof``
    mode of ``w4_w5_window_sweep``."""
    from ..operators.joins import asof_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    trades = events.where(F.col("event_id") % 2 == 1)
    quotes = events.where(F.col("event_id") % 2 == 0)
    out = asof_join(
        trades, quotes, key_cols=("user_id",), ts_col="ts",
        right_cols=("event_id", "value"), prefix="quote_",
    )
    return out.select(
        "event_id", "user_id", "value",
        F.col("quote_event_id"), F.col("quote_value"),
    )


def q_w7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/windows.py:sessionize): per-user
    sessions close after a 6 h silence; per session — event count, span
    seconds, and decimal-exact value total. One shuffle end-to-end: the
    window pass hash-partitions on user_id and the (user_id, session_no)
    aggregation reuses that partitioning. Driver-visible via the
    ``session`` mode of ``w4_w5_window_sweep``."""
    from ..operators.windows import sessionize

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    s = sessionize(
        events, "user_id", "ts", gap_seconds=21600, tiebreak_col="event_id"
    )
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("total_value"),
    )


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler
    (operators/aggregations.py:profile_columns) over three orders
    columns — null/distinct/modal-value stats from ONE scan. Driver-
    visible via the ``profile`` mode of ``metrics_new_vs_existing``."""
    from ..operators.aggregations import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(
        orders, ["o_orderstatus", "o_orderpriority", "o_custkey"]
    )


def q_validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate
    (operators/aggregations.py:validate_expectations) over orders — a
    mixed pass/fail suite so both verdicts are exercised: uniqueness
    holds for the key but FAILS for o_custkey (customers repeat), the
    1000-cap between FAILS (real prices exceed it), row_count_between
    [1, 10] FAILS at every sf. Every check fuses into one scan.
    Driver-visible via the ``expect`` mode of
    ``metrics_new_vs_existing``."""
    from ..operators.aggregations import validate_expectations

    orders = load_table(spark, sf_dir, "orders")
    return validate_expectations(
        orders,
        [
            ("not_null", "o_custkey"),
            ("unique", "o_orderkey"),
            ("unique", "o_custkey"),
            ("between", "o_totalprice", 0.0, 1_000_000.0),
            ("between", "o_totalprice", 0.0, 1_000.0),
            ("values_in", "o_orderstatus", ("F", "O", "P")),
            ("matches", "o_orderpriority", "^[1-5]-"),
            ("min", "o_orderkey", 0),
            ("row_count_between", 1, 10),
        ],
    )


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/setops.py:table_diff) between two
    key-derived views of orders: old drops keys ≡0 (mod 97), new drops
    keys ≡0 (mod 89) and bumps o_totalprice by 1.00 for keys ≡0
    (mod 13) — so all four diff classes appear deterministically.
    Summarized per class. Driver-visible via the ``diff`` mode of
    ``metrics_new_vs_existing``."""
    from ..operators.setops import table_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.where(F.col("o_orderkey") % 97 != 0)
    new = orders.where(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    d = table_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )
    return d.groupBy("diff_status").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_changed_cols").alias("n_changed_cols"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 24 h funnel view → click → purchase
    (operators/behavior.py:funnel): per step, users whose earliest
    qualifying event follows their previous step within a day.
    Driver-visible via the ``funnel`` mode of
    ``metrics_new_vs_existing``."""
    from ..operators.behavior import funnel

    events = load_table(spark, sf_dir, "events")
    return funnel(
        events, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], within_seconds=86400,
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle
    (operators/behavior.py:retention_cohorts): distinct users per
    (first-seen week, activity week offset). Driver-visible via the
    ``cohort`` mode of ``metrics_new_vs_existing``."""
    from ..operators.behavior import retention_cohorts

    events = load_table(spark, sf_dir, "events")
    return retention_cohorts(events, "user_id", "ts")


def _er_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer projection the ER fixtures share. The synthetic customer
    table carries no contact columns — phone and address derive from the
    key so both engines build identical bytes."""
    k = F.col("c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.format_string(
            "%02d-%03d-%04d", k % 80 + 10, k % 1000, k % 10000
        ).alias("c_phone"),
        F.format_string(
            "%d %s Street", k % 97, F.col("c_mktsegment")
        ).alias("c_address"),
    )


def _er_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dirty-CRM record fixture shared by the batch and incremental
    ER members: every customer contributes its base record plus the
    deterministic re-typed variants described in
    ``q_entity_resolution``."""
    k = F.col("c_custkey")
    c = _er_cust(spark, sf_dir)
    cols = lambda rid, name, phone, addr: [  # noqa: E731
        rid.alias("rec_id"), name.alias("name"), phone.alias("phone"),
        addr.alias("address"), F.col("c_nationkey").alias("block_key"),
    ]
    base = c.select(
        *cols(k * 10, F.col("c_name"), F.col("c_phone"), F.col("c_address"))
    )
    v1 = c.where(k % 3 == 0).select(
        *cols(
            k * 10 + 1,
            F.concat(F.lower("c_name"), F.lit(" inc")),
            F.col("c_phone"),
            F.concat(
                F.col("c_address"), F.lit(" suite "),
                (k % 10).cast("string"),
            ),
        )
    )
    v2 = c.where(k % 6 == 0).select(
        *cols(
            k * 10 + 2,
            F.upper("c_name"),
            F.regexp_replace("c_phone", "-", ""),
            F.substring("c_address", 1, 5),
        )
    )
    v3 = c.where(k % 5 == 0).select(
        *cols(
            k * 10 + 3,
            F.lower("c_name"),
            F.lit(None).cast("string"),
            F.col("c_address"),
        )
    )
    return base.unionByName(v1).unionByName(v2).unionByName(v3)


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (operators/entity.py): the customer
    table plays a dirty CRM extract — every customer contributes its
    base record plus deterministic re-typed variants (``%3``: lowercased
    name + ' inc' suffix, same phone; ``%6``: uppercased name, phone
    digits reformatted; ``%5``: lowercased name, phone LOST) — then
    blocking on nationkey → integer milli-scored pairs (name token
    Jaccard + digit-normalized phone equality) → connected components →
    survivorship golden records (name = lowest-key record's spelling,
    phone = min non-null, address = longest). Each variant reaches its
    base through a DIFFERENT evidence path (phone+name, phone-only
    after reformat, name-only after phone loss), so the oracle checks
    all three link rules plus the blocking bound and every survivorship
    strategy. The reference's user dedup is exact-key MERGE only
    (core/extract/helpers/extractor_bq_helpers.py:159-169); this is the
    content-granularity lift a real CRM corpus needs. Driver-visible
    via the ``er`` mode of ``metrics_new_vs_existing``."""
    from ..operators.entity import golden_records, resolve_entities

    records = _er_records(spark, sf_dir)
    asg = resolve_entities(records)
    return golden_records(
        records,
        asg,
        rules={"name": "first_by_key", "phone": "min", "address": "longest"},
    )


def _er_multi_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-pass blocking fixture: the dirty-CRM records plus a
    ``%7`` v4 variant whose nationkey block is CORRUPTED (+1000 — the
    classic data-entry miss single-key blocking can never recover: the
    record lands in a block nobody else inhabits), and a second
    blocking column derived from the phone digits' 4-digit prefix
    (NULL when the phone is absent — a multi-pass key is allowed to be
    missing on most records; NULLs never equi-join, so phone-less
    records simply skip the pass)."""
    c = _er_cust(spark, sf_dir)
    k = F.col("c_custkey")
    v4 = c.where(k % 7 == 0).select(
        (k * 10 + 4).alias("rec_id"),
        F.lower("c_name").alias("name"),
        F.regexp_replace("c_phone", "-", " ").alias("phone"),
        F.col("c_address").alias("address"),
        (F.col("c_nationkey") + 1000).alias("block_key"),
    )
    recs = _er_records(spark, sf_dir).unionByName(v4)
    digits = F.regexp_replace("phone", "[^0-9]", "")
    return recs.withColumn(
        "block_key2",
        F.when(F.length(digits) >= 4, F.substring(digits, 1, 4)),
    )


def q_entity_resolution_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass blocking entity resolution (operators/entity.py:
    entity_pairs with ``block_col=[...]``): the dirty-CRM fixture plus a
    v4 variant whose nationkey block key is corrupted, so SINGLE-key
    blocking provably strands it as a singleton (a pytest pins that) —
    the union of a nationkey pass and a phone-digit-prefix pass recovers
    the pair and the survivorship golden records absorb the variant.
    Mirrors the reference's user matching on THREE id columns
    (core/TicketMessageProcessor.py:24-37). Driver-visible via the
    ``er_multi`` mode of ``metrics_new_vs_existing``."""
    from ..operators.entity import golden_records, resolve_entities

    records = _er_multi_records(spark, sf_dir)
    asg = resolve_entities(records, block_col=["block_key", "block_key2"])
    return golden_records(
        records,
        asg,
        rules={"name": "first_by_key", "phone": "min", "address": "longest"},
    )


def q_entity_resolution_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with a SCALE-CARDINALITY blocking key: the same
    dirty-CRM fixture as ``q_entity_resolution``, blocked on the
    lowercased first name token instead of nationkey. Nationkey gives
    25 fixed blocks, so block size — and scored pairs — grow
    quadratically with scale factor (the round-10 headline member's
    measured 0.256/unit at 64×, refusing at sf1 under the default
    ``max_block``); the name token's cardinality grows WITH the data
    (one block per customer family, ≤ 4 records each), so pair count is
    linear in N and the member runs unchanged at any scale factor under
    default guards. This is the production blocking choice the operator
    docstring prescribes ("refine the blocking key") and the bench
    member that measures the ER pipeline's real per-record cost
    (normalize → block join → integer milli-score → connected
    components → survivorship) instead of a fixture's pair-count
    growth; the nationkey member stays as the deliberate stress /
    correctness row. Driver-visible via the ``er_name`` mode of
    ``metrics_new_vs_existing``."""
    from ..operators.entity import golden_records, resolve_entities

    records = _er_records(spark, sf_dir).withColumn(
        "block_key",
        F.split(F.lower(F.trim("name")), r"\s+").getItem(0),
    )
    asg = resolve_entities(records)
    return golden_records(
        records,
        asg,
        rules={"name": "first_by_key", "phone": "min", "address": "longest"},
    )


def q_entity_resolution_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental entity resolution (operators/entity.py:
    incremental_resolve_entities): the v1/v3 variant records (rec_id %
    10 ∈ {1, 3}) play the incoming delta, base + v2 the standing corpus
    whose STORED assignment (derived in-member; a table in production)
    summarizes everything already resolved. Only delta-involved pairs
    are scored, yet the oracle is the FULL-batch assignment — exact,
    including the entity MERGES a delta record causes when it bridges
    two standing entities (v1 arrives with phone+name evidence, v3 with
    name-only, so both link rules cross the delta boundary here).
    Audit note: roughly half this member's plan (and its MANY-SHUFFLES
    count) is the in-member derivation of the STORED assignment via a
    full batch resolve — production reads that from a table, paying
    only the delta-broadcast joins on the right of the plan.
    Driver-visible via the ``er_inc`` mode of
    ``metrics_new_vs_existing``."""
    from ..operators.entity import (
        incremental_resolve_entities,
        resolve_entities,
    )

    records = _er_records(spark, sf_dir)
    tag = F.col("rec_id") % 10
    corpus = records.where(~tag.isin(1, 3))
    delta = records.where(tag.isin(1, 3))
    return incremental_resolve_entities(
        corpus, delta, corpus_assignment=resolve_entities(corpus)
    )


def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization
    (operators/aggregations.py:standardize): event values scaled against
    their event type's mean/σ — decimal-exact sums make μ/σ
    order-independent, and the stats relation broadcasts back onto the
    rows (the corpus never shuffles). Driver-visible via the ``zscore``
    mode of ``w4_w5_window_sweep``."""
    from ..operators.aggregations import standardize

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return standardize(events, ("event_type",), "value").select(
        "event_id", "event_type", "value", "zscore"
    )


def q_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip on Spark's native operators: order
    counts cross-tabbed priority × status (``groupBy().pivot(values)``
    — values listed explicitly so the plan needs no extra distinct-scan
    pass), then melted back to long form with ``unpivot``. Emitting the
    long form makes the oracle a plain conditional aggregate while the
    Spark plan still exercises both pivot directions; absent
    combinations surface as count 0 (the round trip materializes the
    full cross product — exactly what a plain GROUP BY can't do).
    Driver-visible via the ``pivot`` mode of ``a2_a3_distinct_suite``."""
    orders = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
    )
    return (
        pv.unpivot("o_orderpriority", statuses, "status", "n")
        .select(
            "o_orderpriority",
            "status",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap fill with LOCF per event type
    (operators/aggregations.py:gap_fill_locf): every hour between each
    type's first and last event exists in the output — observed hours
    carry their decimal-exact sum, silent hours carry the
    last-seen value and is_gap = true. Driver-visible via the ``gf_*``
    modes of ``f7_f9_time_buckets``."""
    from ..operators.aggregations import gap_fill_locf

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    return gap_fill_locf(events, ("event_type",), "ts", 3600, "value")


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (operators/aggregations.py:kmv_distinct):
    per order status, the k=64 minimum md5 hash fractions of o_custkey
    and the resulting estimate — deterministic, mergeable, oracle-exact.
    Driver-visible via the ``kmv*`` modes of ``a2_a3_distinct_suite``."""
    from ..operators.aggregations import kmv_distinct

    orders = load_table(spark, sf_dir, "orders")
    return kmv_distinct(orders, ("o_orderstatus",), "o_custkey", k=64)


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter key membership (operators/aggregations.py:bloom_build
    / bloom_membership): the filter distills every ordering customer key
    into ≤128 broadcastable 64-bit words (m=8192, k=4); every customer
    probes it. Per market segment: probes, might-contain hits, and true
    members — no false negatives means n_might ≥ n_members, with the
    surplus the (1−e^(−kn/m))^k false-positive tail. Driver-visible via
    the ``bloom`` mode of ``a2_a3_distinct_suite``."""
    from ..operators.aggregations import bloom_build, bloom_membership

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    bloom = bloom_build(orders, "o_custkey", m_bits=8192, n_hashes=4)
    mem = bloom_membership(customer, "c_custkey", bloom, m_bits=8192, n_hashes=4)
    members = (
        orders.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("is_member", F.lit(1))
    )
    return (
        customer.select("c_mktsegment", "c_custkey")
        .join(mem, "c_custkey", "left")
        .join(members, "c_custkey", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum(F.col("might_contain").cast("long")).alias("n_might"),
            F.sum(F.coalesce(F.col("is_member"), F.lit(0)).cast("long")).alias(
                "n_members"
            ),
        )
    )


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch (operators/aggregations.py:
    value_histogram / histogram_quantiles): per order status, p50/p95 of
    the order value from a 128-bin fixed-edge histogram — deterministic
    IEEE double math both engines reproduce bit-for-bit, mergeable by
    summing same-edge bins. Driver-visible via the ``hq`` mode of
    ``a2_a3_distinct_suite``."""
    from ..operators.aggregations import histogram_quantiles, value_histogram

    orders = load_table(spark, sf_dir, "orders")
    hist = value_histogram(orders, ("o_orderstatus",), "o_totalprice", 128)
    return histogram_quantiles(hist, ("o_orderstatus",), (0.5, 0.95), 128)


def q_ht_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable time rollup (operators/aggregations.py:
    hypertable_rollup): hour/day/month continuous aggregates where each
    coarser level re-aggregates from the finer one — raw scanned once.
    Driver-visible via the ``ht_*`` modes of ``f7_f9_time_buckets``."""
    from ..operators.aggregations import hypertable_rollup

    events = load_table(spark, sf_dir, "events").select("ts", "value")
    return hypertable_rollup(events, "ts", "value")


def q_j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (operators/joins.py:range_join): the five
    highest-value orders define 30-day promo windows from their order
    date; count/sum the lineitems shipping inside each window. No join
    key — pure interval containment, bucketed so it never goes
    quadratic. Driver-visible via the ``range``/``range_qty`` modes of
    ``j2_j4_semi_anti``."""
    from ..operators.joins import range_join

    orders = load_table(spark, sf_dir, "orders")
    promo = (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(5)
        .select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("d"),
        )
        .select(
            "o_orderkey",
            F.col("d").alias("promo_start"),
            (F.col("d") + 30).alias("promo_end"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")).alias("ship_day"),
        "l_quantity",
    )
    joined = range_join(
        li, promo, "ship_day", "promo_start", "promo_end", bucket_width=30
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
    )


# ----------------------------------------------------------- E: set ops
def q_e1_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: run − existing (new ids; ExtractionLogger.py:102-107)."""
    orders = load_table(spark, sf_dir, "orders")
    run = orders.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    existing = (
        orders.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    return missing_keys(run, existing, "o_custkey")


def q_e2_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: run ∩ existing (ExtractionLogger.py:108)."""
    orders = load_table(spark, sf_dir, "orders")
    run = orders.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    existing = (
        orders.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    return semi_join(run, existing, "o_custkey")


def q_e3_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: vertical concat of per-batch results
    (extraction_helpers.py:218-226)."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.where(F.col("o_totalprice") >= 300000).select(
        "o_orderkey", F.lit("high").alias("bucket")
    )
    lo = orders.where(F.col("o_totalprice") < 20000).select(
        "o_orderkey", F.lit("low").alias("bucket")
    )
    return union_all([hi, lo])


def q_metrics_new_vs_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractionLogger.calculate_metrics: new/existing/total accounting in
    one distributed pass (no driver-side sets)."""
    events = load_table(spark, sf_dir, "events")
    run = events.where(
        (F.col("ts") >= F.lit(WIN_START)) & (F.col("ts") < F.lit(WIN_END))
    ).select("user_id")
    existing = events.where(F.col("ts") < F.lit(WIN_START)).select("user_id")
    return new_vs_existing_counts(run, existing, "user_id")


# ---------------------------------------------------------- F: functions
def q_f1_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: regex extract with default (reference_code,
    extraction_helpers.py:24-29)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        extract_reference_code(
            F.col("text"), r"\b(spark|hash|merge)\b", "No Match"
        ).alias("first_keyword"),
    )


def q_f2_f3_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2+F3: string normalization chain (clean_str + normalize_location,
    core/Geocode.py:36-40, utils/geocode_utils.py:5-14)."""
    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", "p_name").withColumn(
        "name_norm", normalize_location(F.upper(F.col("p_name")))
    )


def q_f6_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: array → delimited string (tag flattening, core/Ticket.py:60)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id", F.array_join(F.slice(toks, 1, 5), ",").alias("first_tokens")
    )


def q_f7_tz_manila(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: UTC → Asia/Manila wall-clock pipeline (utils/date_utils.py:4-12);
    daily event counts by Manila calendar date."""
    events = load_table(spark, sf_dir, "events")
    manila_date = F.to_date(to_manila(F.col("ts")))
    return (
        events.groupBy(manila_date.alias("manila_date"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q_f8_tumbling_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: 6-hour tumbling-window bucketing — the reference's manual
    extraction window (extraction_helpers.py:88-93) as an expression."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(tumbling_6h_bucket(F.col("ts")).alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(MONEY)), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


def q_f9_month_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: month window bounds (utils/tickets_util.py:6-8)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.last_day(F.col("o_orderdate")).alias("month_end_day"),
        )
        .groupBy("month_start", "month_end_day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_f11_schedule_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: free-text schedule date+time fusion
    (extraction_helpers.py:164-216) over synthesized AM/PM variants."""
    events = load_table(spark, sf_dir, "events")
    time_str = (
        F.when(F.col("event_id") % 4 == 0, F.lit("3PM"))
        .when(F.col("event_id") % 4 == 1, F.lit("11:30 am"))
        .when(F.col("event_id") % 4 == 2, F.lit(" 7 PM "))
        .otherwise(F.lit("garbage"))
    )
    base = events.select(
        "event_id", F.to_date("ts").cast("string").alias("sched_date"),
        time_str.alias("sched_time"),
    )
    return base.select(
        "event_id",
        fuse_schedule(F.col("sched_date"), F.col("sched_time")).alias(
            "schedule_ts"
        ),
    )


def q_f12_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: SAFE_CAST ≡ try_cast — null on failure, never error
    (extractor_bq_helpers.py:131-153)."""
    events = load_table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("event_id") % 3 == 0, F.col("value").cast("string")
    ).otherwise(F.concat(F.lit("x"), F.col("event_type")))
    return events.select(
        "event_id",
        mixed.try_cast("double").alias("safe_value"),
        F.col("event_type").try_cast("timestamp").alias("safe_ts"),
    )


def q_f13_resolve_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: name→email→'Unknown Name' coalesce chain
    (TicketMessageProcessor.py:196-205) over synthesized blanks."""
    cust = load_table(spark, sf_dir, "customer")
    name = F.when(F.col("c_custkey") % 3 == 0, F.lit(" ")).otherwise(
        F.col("c_name")
    )
    email = F.when(F.col("c_custkey") % 9 == 0, F.lit("")).otherwise(
        F.concat(F.lit("user"), F.col("c_custkey"), F.lit("@example.com"))
    )
    return cust.select(
        "c_custkey", resolve_name(name, email).alias("display_name")
    )


def q_f14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: JSON parse of the props column (json.loads / json_normalize,
    ConvoDataExtract.py:126) + aggregate on the extracted field."""
    events = load_table(spark, sf_dir, "events")
    k = json_get(F.col("props"), "k").try_cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
        )
    )


def q_f16_iso_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: datetime → ISO-8601 serialization (api/logs/routes.py:15-25)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", to_iso(F.col("o_orderdate")).alias("orderdate_iso")
    )


# ------------------------------------------------------------- K: sinks
def q_k4_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: staged MERGE upsert semantics (extractor_bq_helpers.py:40-185)
    expressed relationally: target = orders, source = re-extracted batch
    with changed values; result = source ∪ (target ⟮anti⟯ source).
    Materialized-sink variant (Delta MERGE / staged overwrite) lives in
    sinks.upsert; this query validates the merge algebra."""
    orders = load_table(spark, sf_dir, "orders")
    source = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
    )
    target_keep = orders.join(source.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = target_keep.unionByName(source)
    return merged.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast(MONEY)), 2)
        .cast("double")
        .alias("total_value"),
    )


# --------------------------------------------------------------------------
# DuckDB oracle twins. Same column names/aliases as the Spark queries (the
# correctness gate sorts columns by name before hashing values). DuckDB
# deltas handled throughout: regexp_replace needs the 'g' flag, integer
# sums are cast to BIGINT (DuckDB sum(int) → HUGEINT), date_trunc is cast
# to TIMESTAMP, epoch seconds via epoch_us(ts)//1000000 (truncating, same
# as Spark's unix_timestamp).
_P2_IDS = ", ".join(f"'{i}'" for i in range(0, 200, 7))

# entity-resolution CTE prefix (record fixture → pairs → recursive CC
# walk → per-record assignment), shared by the batch golden-record
# oracle and the incremental-assignment oracle — one mirror, two members
_ER_CTES = r"""cust AS (
          SELECT c_custkey, c_name, c_nationkey,
                 printf('%02d-%03d-%04d', c_custkey % 80 + 10,
                        c_custkey % 1000, c_custkey % 10000) AS c_phone,
                 printf('%d %s Street', c_custkey % 97, c_mktsegment)
                   AS c_address
          FROM customer),
        recs AS (
          SELECT c_custkey * 10 AS rec_id, c_name AS name,
                 c_phone AS phone, c_address AS address,
                 c_nationkey AS bk
          FROM cust
          UNION ALL
          SELECT c_custkey * 10 + 1, lower(c_name) || ' inc', c_phone,
                 c_address || ' suite ' || CAST(c_custkey % 10 AS VARCHAR),
                 c_nationkey
          FROM cust WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey * 10 + 2, upper(c_name),
                 replace(c_phone, '-', ''), substr(c_address, 1, 5),
                 c_nationkey
          FROM cust WHERE c_custkey % 6 = 0
          UNION ALL
          SELECT c_custkey * 10 + 3, lower(c_name), NULL, c_address,
                 c_nationkey
          FROM cust WHERE c_custkey % 5 = 0),
        prep AS (
          SELECT rec_id, bk, name, phone, address,
                 COALESCE(list_distinct(list_filter(
                   string_split_regex(lower(trim(name)), '\s+'),
                   x -> x <> '')), []) AS toks,
                 COALESCE(regexp_replace(phone, '[^0-9]', '', 'g'), '')
                   AS ph
          FROM recs),
        pairs AS (
          SELECT a.rec_id AS id_a, b.rec_id AS id_b
          FROM prep a JOIN prep b
            ON a.bk = b.bk AND a.rec_id < b.rec_id
          WHERE (CASE WHEN a.ph <> '' AND b.ph <> '' AND a.ph = b.ph
                      THEN 500 ELSE 0 END)
              + 500 * (CASE WHEN length(list_distinct(
                                 list_concat(a.toks, b.toks))) > 0
                       THEN 1000 * length(list_intersect(a.toks, b.toks))
                            // length(list_distinct(
                                 list_concat(a.toks, b.toks)))
                       ELSE 0 END) // 1000
              >= 450),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        walk(node, lbl) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node),
        comp AS (SELECT node, min(lbl) AS entity_id FROM walk GROUP BY node),
        asg AS (
          SELECT p.rec_id, COALESCE(c.entity_id, p.rec_id) AS entity_id
          FROM prep p LEFT JOIN comp c ON c.node = p.rec_id)"""

# scale-keyed mirror: IDENTICAL to _ER_CTES except the blocking key —
# prep's bk becomes the lowercased first name token (cardinality ∝ N,
# one block per customer family) instead of recs' 25-value nationkey.
# Derived by single substitution so the twins can never drift anywhere
# except the one line that differs.
_ER_NAME_CTES = _ER_CTES.replace(
    "SELECT rec_id, bk, name, phone, address,",
    r"SELECT rec_id, string_split_regex(lower(trim(name)), '\s+')[1]"
    " AS bk, name, phone, address,",
)

# multi-pass blocking mirror: the same fixture plus the corrupted-block
# v4 variant, a phone-prefix second blocking key, and candidate pairs as
# the UNION of the two passes (deduped before scoring) — everything else
# (score spec, recursive CC walk, survivorship) identical to _ER_CTES
_ER_MULTI_CTES = r"""cust AS (
          SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                 printf('%02d-%03d-%04d', c_custkey % 80 + 10,
                        c_custkey % 1000, c_custkey % 10000) AS c_phone,
                 printf('%d %s Street', c_custkey % 97, c_mktsegment)
                   AS c_address
          FROM customer),
        recs AS (
          SELECT c_custkey * 10 AS rec_id, c_name AS name,
                 c_phone AS phone, c_address AS address,
                 c_nationkey AS bk
          FROM cust
          UNION ALL
          SELECT c_custkey * 10 + 1, lower(c_name) || ' inc', c_phone,
                 c_address || ' suite ' || CAST(c_custkey % 10 AS VARCHAR),
                 c_nationkey
          FROM cust WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey * 10 + 2, upper(c_name),
                 replace(c_phone, '-', ''), substr(c_address, 1, 5),
                 c_nationkey
          FROM cust WHERE c_custkey % 6 = 0
          UNION ALL
          SELECT c_custkey * 10 + 3, lower(c_name), NULL, c_address,
                 c_nationkey
          FROM cust WHERE c_custkey % 5 = 0
          UNION ALL
          SELECT c_custkey * 10 + 4, lower(c_name),
                 replace(c_phone, '-', ' '), c_address,
                 c_nationkey + 1000
          FROM cust WHERE c_custkey % 7 = 0),
        prep AS (
          SELECT rec_id, bk, name, phone, address,
                 COALESCE(list_distinct(list_filter(
                   string_split_regex(lower(trim(name)), '\s+'),
                   x -> x <> '')), []) AS toks,
                 COALESCE(regexp_replace(phone, '[^0-9]', '', 'g'), '')
                   AS ph,
                 CASE WHEN length(COALESCE(
                        regexp_replace(phone, '[^0-9]', '', 'g'), '')) >= 4
                      THEN substr(COALESCE(
                        regexp_replace(phone, '[^0-9]', '', 'g'), ''), 1, 4)
                 END AS bk2
          FROM recs),
        cand AS (
          SELECT a.rec_id AS id_a, b.rec_id AS id_b
          FROM prep a JOIN prep b
            ON a.bk = b.bk AND a.rec_id < b.rec_id
          UNION
          SELECT a.rec_id, b.rec_id
          FROM prep a JOIN prep b
            ON a.bk2 = b.bk2 AND a.rec_id < b.rec_id),
        pairs AS (
          SELECT c.id_a, c.id_b
          FROM cand c
          JOIN prep a ON a.rec_id = c.id_a
          JOIN prep b ON b.rec_id = c.id_b
          WHERE (CASE WHEN a.ph <> '' AND b.ph <> '' AND a.ph = b.ph
                      THEN 500 ELSE 0 END)
              + 500 * (CASE WHEN length(list_distinct(
                                 list_concat(a.toks, b.toks))) > 0
                       THEN 1000 * length(list_intersect(a.toks, b.toks))
                            // length(list_distinct(
                                 list_concat(a.toks, b.toks)))
                       ELSE 0 END) // 1000
              >= 450),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        walk(node, lbl) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node),
        comp AS (SELECT node, min(lbl) AS entity_id FROM walk GROUP BY node),
        asg AS (
          SELECT p.rec_id, COALESCE(c.entity_id, p.rec_id) AS entity_id
          FROM prep p LEFT JOIN comp c ON c.node = p.rec_id)"""

ORACLES: dict[str, str] = {
    "s6_sql_scan": """
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        FROM orders GROUP BY o_orderstatus
    """,
    "s7_preview": "SELECT * FROM orders ORDER BY o_orderkey ASC LIMIT 10",
    "p2_project_cast_distinct": f"""
        SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS id, c_name AS name,
               c_mktsegment AS segment
        FROM customer
        WHERE CAST(c_custkey AS VARCHAR) IN ({_P2_IDS}) AND c_custkey IS NOT NULL
    """,
    "p3_time_window": f"""
        SELECT event_id, user_id, event_type FROM events
        WHERE ts >= TIMESTAMP '{WIN_START}' AND ts < TIMESTAMP '{WIN_END}'
    """,
    "p4_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
    "p6_p10_hygiene": """
        SELECT event_id, user_id, coalesce(event_type, '') AS event_type,
               coalesce(value, 0.0) AS value
        FROM events
    """,
    "p8_derived_columns": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(month(o_orderdate) AS BIGINT) AS order_month,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DOUBLE) AS double_price
        FROM orders
    """,
    "j1_broadcast_enrich": """
        SELECT n.n_name AS nation, r.r_name AS region, count(*) AS n_orders,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    """,
    "j2_anti_join": """
        SELECT c_mktsegment AS segment, count(*) AS n_customers_without_orders
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY c_mktsegment
    """,
    "j3_correlated_attach": """
        SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority, o_orderstatus
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    "j4_semi_join": """
        SELECT o_orderstatus AS status, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        GROUP BY o_orderstatus
    """,
    "j5_similarity_argmax": r"""
        WITH names AS (SELECT DISTINCT p_name FROM part),
        g AS (
          SELECT p_name, lower(p_name) AS l,
                 list_distinct(list_transform(
                   range(1, greatest(length(p_name) - 2, 1) + 1),
                   i -> substring(lower(p_name), CAST(i AS INT), 3))) AS grams
          FROM names),
        scored AS (
          SELECT a.p_name, b.p_name AS match_name,
                 CAST(length(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                 CAST(length(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS s
          FROM g a CROSS JOIN g b
          WHERE a.l <> b.l),
        ranked AS (
          SELECT p_name, match_name, s,
                 row_number() OVER (PARTITION BY p_name ORDER BY s DESC, match_name ASC) AS rn
          FROM scored WHERE s >= 0.1)
        SELECT p_name, match_name, round(s, 6) AS score FROM ranked WHERE rn = 1
    """,
    "j6_fuzzy_threshold": """
        WITH names AS (SELECT DISTINCT p_name FROM part),
        types AS (SELECT DISTINCT p_type FROM part),
        scored AS (
          SELECT p_name,
                 CASE WHEN greatest(length(p_name), length(p_type)) = 0 THEN 100.0
                      ELSE (1.0 - CAST(levenshtein(lower(p_name), lower(p_type)) AS DOUBLE)
                            / greatest(length(p_name), length(p_type))) * 100.0
                 END AS s
          FROM names CROSS JOIN types)
        SELECT p_name, round(max(s), 6) AS best_score,
               CASE WHEN max(s) >= 40.0 THEN 'Yes' ELSE 'No' END AS viable
        FROM scored GROUP BY p_name
    """,
    "j7_positional_join": """
        WITH l AS (SELECT row_number() OVER (ORDER BY n_nationkey) AS rn, n_name
                   FROM nation),
             r AS (SELECT row_number() OVER (ORDER BY n_nationkey) AS rn, n_regionkey
                   FROM nation)
        SELECT rn, n_name, n_regionkey FROM l JOIN r USING (rn)
    """,
    "a1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,4)))
                    * (1 + CAST(l_tax AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_charge,
               count(*) AS count_order,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "a2_distinct": "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "a3_multi_column_distinct": """
        SELECT DISTINCT id FROM (
          SELECT l_partkey AS id FROM lineitem
          UNION ALL SELECT l_suppkey AS id FROM lineitem)
        WHERE id IS NOT NULL
    """,
    "a5_ordered_group_concat": """
        SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS event_stream
        FROM events GROUP BY user_id
    """,
    "a6_first_row_pick": """
        SELECT arg_min(o_totalprice, o_orderkey) AS o_totalprice,
               arg_min(o_orderstatus, o_orderkey) AS o_orderstatus
        FROM orders
    """,
    "w2_topk_per_group": """
        SELECT o_orderkey, o_orderpriority, o_totalprice, CAST(rn AS BIGINT) AS "rank"
        FROM (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
        WHERE rn <= 3
    """,
    "w3_ordered_limit": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "w4_lag_lead": """
        SELECT event_id, user_id,
               round(value - lag(value) OVER w, 6) AS value_delta,
               (epoch_us(ts) // 1000000) - (epoch_us(lag(ts) OVER w) // 1000000) AS gap_seconds
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
    "w5_rolling_window": """
        WITH daily AS (
          SELECT o_orderpriority AS priority,
                 CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
                 sum(CAST(o_totalprice AS DECIMAL(12,2))) AS day_total
          FROM orders GROUP BY 1, 2)
        SELECT priority, day_no,
               CAST(round(sum(day_total) OVER (
                 PARTITION BY priority ORDER BY day_no
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rolling_7d
        FROM daily
    """,
    # union-and-carry-forward asof (mirrors operators/joins.py:asof_join:
    # right sorts before left at equal ts; right-right ties by max id)
    "w6_asof_join": """
        WITH t AS (
          SELECT event_id, user_id, ts, value FROM events WHERE event_id % 2 = 1),
        q AS (
          SELECT event_id, user_id, ts, value FROM events WHERE event_id % 2 = 0),
        u AS (
          SELECT event_id, user_id, ts, value, 1 AS side,
                 CAST(NULL AS BIGINT) AS tb,
                 CAST(NULL AS STRUCT(id BIGINT, val DOUBLE)) AS pl
          FROM t
          UNION ALL
          SELECT NULL, user_id, ts, NULL, 0, event_id,
                 struct_pack(id := event_id, val := value)
          FROM q),
        c AS (
          SELECT *, last_value(pl IGNORE NULLS) OVER w AS m
          FROM u
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts, side, coalesce(tb, -1)
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id, value,
               m.id AS quote_event_id, m.val AS quote_value
        FROM c WHERE side = 1
    """,
    # lag + running-sum-of-boundaries sessionization, mirroring
    # operators/windows.py:sessionize (boundary when gap NULL or > 21600 s)
    "w7_sessionize": """
        WITH e AS (
          SELECT event_id, user_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
          FROM events),
        s AS (
          SELECT *, CAST(sum(CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts)
                           > CAST(21600 AS BIGINT) * 1000000
                      THEN 1 ELSE 0 END) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_no
          FROM e)
        SELECT user_id, session_no, count(*) AS n_events,
               (epoch_us(max(ts)) // 1000000)
                 - (epoch_us(min(ts)) // 1000000) AS duration_s,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)
                 AS total_value
        FROM s GROUP BY user_id, session_no
    """,
    # one block per profiled column, mirroring profile_columns: stats
    # over the native column, modal value over its VARCHAR cast with
    # (count, value) descending tie-break
    "profile_columns": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS "column", b.n_rows, b.n_null, b.n_distinct,
               t.value AS top_value, t.cnt AS top_n
        FROM (
          SELECT count(*) AS n_rows,
                 CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_null,
                 count(DISTINCT {c}) AS n_distinct
          FROM orders) b
        LEFT JOIN (
          SELECT CAST({c} AS VARCHAR) AS value, count(*) AS cnt
          FROM orders WHERE {c} IS NOT NULL
          GROUP BY 1 ORDER BY cnt DESC, value DESC LIMIT 1) t ON true
        """
        for c in ("o_orderstatus", "o_orderpriority", "o_custkey")
    ),
    # one SELECT per expectation, mirroring the fused-agg checks
    # (violations count NULLs for the range/set/pattern kinds)
    "validate_expectations": """
        WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
        SELECT 'not_null' AS check, 'o_custkey' AS "column",
               CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
                 AS violations, n.n_rows,
               count(*) FILTER (WHERE o_custkey IS NULL) = 0 AS passed
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'unique', 'o_orderkey',
               CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                 AS BIGINT), n.n_rows,
               count(o_orderkey) = count(DISTINCT o_orderkey)
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'unique', 'o_custkey',
               CAST(count(o_custkey) - count(DISTINCT o_custkey)
                 AS BIGINT), n.n_rows,
               count(o_custkey) = count(DISTINCT o_custkey)
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'between', 'o_totalprice',
               CAST(count(*) FILTER (WHERE NOT coalesce(
                 o_totalprice >= 0.0 AND o_totalprice <= 1000000.0,
                 FALSE)) AS BIGINT), n.n_rows,
               count(*) FILTER (WHERE NOT coalesce(
                 o_totalprice >= 0.0 AND o_totalprice <= 1000000.0,
                 FALSE)) = 0
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'between', 'o_totalprice',
               CAST(count(*) FILTER (WHERE NOT coalesce(
                 o_totalprice >= 0.0 AND o_totalprice <= 1000.0,
                 FALSE)) AS BIGINT), n.n_rows,
               count(*) FILTER (WHERE NOT coalesce(
                 o_totalprice >= 0.0 AND o_totalprice <= 1000.0,
                 FALSE)) = 0
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'values_in', 'o_orderstatus',
               CAST(count(*) FILTER (WHERE NOT coalesce(
                 o_orderstatus IN ('F', 'O', 'P'), FALSE)) AS BIGINT),
               n.n_rows,
               count(*) FILTER (WHERE NOT coalesce(
                 o_orderstatus IN ('F', 'O', 'P'), FALSE)) = 0
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'matches', 'o_orderpriority',
               CAST(count(*) FILTER (WHERE NOT coalesce(
                 regexp_matches(o_orderpriority, '^[1-5]-'), FALSE))
                 AS BIGINT), n.n_rows,
               count(*) FILTER (WHERE NOT coalesce(
                 regexp_matches(o_orderpriority, '^[1-5]-'), FALSE)) = 0
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'min', 'o_orderkey',
               CAST(count(*) FILTER (WHERE NOT coalesce(
                 o_orderkey >= 0, FALSE)) AS BIGINT), n.n_rows,
               count(*) FILTER (WHERE NOT coalesce(
                 o_orderkey >= 0, FALSE)) = 0
        FROM orders, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'row_count_between[1,10]', '',
               CAST(CASE WHEN n.n_rows < 1 THEN 1 - n.n_rows
                         WHEN n.n_rows > 10 THEN n.n_rows - 10
                         ELSE 0 END AS BIGINT), n.n_rows,
               n.n_rows BETWEEN 1 AND 10
        FROM n
    """,
    # full-outer-join diff classes over the same key-derived snapshots
    "table_diff": """
        WITH o AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 97 <> 0),
        n AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 89 <> 0),
        j AS (
          SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
                 o.o_orderkey IS NOT NULL AS in_old,
                 n.o_orderkey IS NOT NULL AS in_new,
                 (CASE WHEN o.o_orderstatus IS NOT DISTINCT FROM
                            n.o_orderstatus THEN 0 ELSE 1 END)
                 + (CASE WHEN o.o_totalprice IS NOT DISTINCT FROM
                              n.o_totalprice THEN 0 ELSE 1 END) AS nd
          FROM o FULL OUTER JOIN n USING (o_orderkey)),
        c AS (
          SELECT CASE WHEN NOT in_old THEN 'added'
                      WHEN NOT in_new THEN 'removed'
                      WHEN nd > 0 THEN 'changed'
                      ELSE 'unchanged' END AS diff_status,
                 CASE WHEN in_old AND in_new THEN nd ELSE 0 END AS nd
          FROM j)
        SELECT diff_status, count(*) AS n_keys,
               CAST(sum(nd) AS BIGINT) AS n_changed_cols
        FROM c GROUP BY 1
    """,
    # same per-user sorted-timestamp-list recurrence as behavior.funnel:
    # t0 = earliest 'view'; t_k = earliest next-step event in
    # (t_{k-1}, t_{k-1} + 24 h]
    "funnel": """
        WITH pu AS (
          SELECT user_id,
                 list_sort(list_filter(list(CASE WHEN event_type = 'view'
                   THEN ts END), x -> x IS NOT NULL)) AS t0,
                 list_sort(list_filter(list(CASE WHEN event_type = 'click'
                   THEN ts END), x -> x IS NOT NULL)) AS t1,
                 list_sort(list_filter(list(CASE WHEN event_type = 'purchase'
                   THEN ts END), x -> x IS NOT NULL)) AS t2
          FROM events GROUP BY user_id),
        r AS (
          SELECT user_id, t0[1] AS r0,
                 list_filter(t1, x -> x > t0[1]
                   AND x <= t0[1] + INTERVAL 86400 SECOND)[1] AS r1
          FROM pu),
        r2 AS (
          SELECT r.user_id, r.r0, r.r1,
                 list_filter(pu.t2, x -> x > r.r1
                   AND x <= r.r1 + INTERVAL 86400 SECOND)[1] AS rr2
          FROM r JOIN pu USING (user_id))
        SELECT 1 AS step_no, 'view' AS step,
               CAST(sum(CASE WHEN r0 IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_users FROM r2
        UNION ALL
        SELECT 2, 'click',
               CAST(sum(CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) FROM r2
        UNION ALL
        SELECT 3, 'purchase',
               CAST(sum(CASE WHEN rr2 IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) FROM r2
    """,
    "retention_cohorts": """
        WITH first AS (
          -- DuckDB date_trunc('week') yields DATE; cast back to match
          -- Spark's TIMESTAMP week bucket
          SELECT user_id,
                 CAST(min(date_trunc('week', ts)) AS TIMESTAMP)
                   AS cohort_week
          FROM events GROUP BY user_id),
        active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
          FROM events)
        SELECT f.cohort_week,
               ((epoch_us(a.w) // 1000000)
                - (epoch_us(f.cohort_week) // 1000000)) // 604800 AS week_no,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM active a JOIN first f USING (user_id)
        GROUP BY 1, 2
    """,
    # entity resolution: same dirty-variant fixture, same integer
    # milli-score spec (operators/entity.py:entity_pairs docstring),
    # recursive-CTE connected components, and the three survivorship
    # aggregates (arg_min / min / padded-length max)
    "entity_resolution": f"""
        WITH RECURSIVE {_ER_CTES}
        SELECT a.entity_id,
               CAST(count(*) AS BIGINT) AS n_records,
               arg_min(r.name, r.rec_id) AS name,
               min(r.phone) AS phone,
               substr(max(lpad(CAST(length(r.address) AS VARCHAR), 8, '0')
                          || '|' || r.address), 10) AS address
        FROM asg a JOIN prep r ON r.rec_id = a.rec_id
        GROUP BY 1
    """,
    # multi-pass blocking: candidate pairs are the UNION of the
    # nationkey pass and the phone-prefix pass — the corrupted-block v4
    # variant is reachable only through pass 2
    "entity_resolution_multi": f"""
        WITH RECURSIVE {_ER_MULTI_CTES}
        SELECT a.entity_id,
               CAST(count(*) AS BIGINT) AS n_records,
               arg_min(r.name, r.rec_id) AS name,
               min(r.phone) AS phone,
               substr(max(lpad(CAST(length(r.address) AS VARCHAR), 8, '0')
                          || '|' || r.address), 10) AS address
        FROM asg a JOIN prep r ON r.rec_id = a.rec_id
        GROUP BY 1
    """,
    # scale-keyed ER: the name-token blocking twin — one substituted
    # line vs the nationkey oracle (see _ER_NAME_CTES)
    "entity_resolution_name": f"""
        WITH RECURSIVE {_ER_NAME_CTES}
        SELECT a.entity_id,
               CAST(count(*) AS BIGINT) AS n_records,
               arg_min(r.name, r.rec_id) AS name,
               min(r.phone) AS phone,
               substr(max(lpad(CAST(length(r.address) AS VARCHAR), 8, '0')
                          || '|' || r.address), 10) AS address
        FROM asg a JOIN prep r ON r.rec_id = a.rec_id
        GROUP BY 1
    """,
    # the incremental member's oracle is the FULL-batch assignment —
    # delta-only pair work must reproduce it exactly, merges included
    "entity_resolution_inc": f"""
        WITH RECURSIVE {_ER_CTES},
        sizes AS (
          SELECT entity_id, count(*) AS n FROM asg GROUP BY 1)
        SELECT a.rec_id, a.entity_id, CAST(s.n AS BIGINT) AS n_records
        FROM asg a JOIN sizes s USING (entity_id)
    """,
    # decimal-exact per-group moments → double scalars, mirroring
    # operators/aggregations.py:standardize expression-for-expression
    "zscore": """
        WITH st AS (
          SELECT event_type,
                 CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s,
                 CAST(sum(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE)
                   AS s2,
                 CAST(count(value) AS DOUBLE) AS n,
                 min(value) AS mn, max(value) AS mx
          FROM events GROUP BY 1),
        m AS (
          SELECT event_type, mn, mx, s / n AS mean,
                 s2 / n - (s / n) * (s / n) AS var
          FROM st)
        -- LEFT JOIN + min<>max guard mirror the standardize operator:
        -- NULL-keyed rows are kept (zscore NULL) and quantized constant
        -- groups are caught even when var rounds to a small positive
        SELECT e.event_id, e.event_type, e.value,
               round((e.value - m.mean)
                     / sqrt(CASE WHEN m.mn < m.mx AND m.var > 0
                            THEN m.var END), 6) AS zscore
        FROM events e LEFT JOIN m USING (event_type)
    """,
    # full priority × {F,O,P} cross product with 0 for absent combos —
    # the long form of the pivot/unpivot round trip
    "pivot_unpivot": """
        WITH p AS (SELECT DISTINCT o_orderpriority FROM orders),
        s AS (SELECT unnest(['F', 'O', 'P']) AS status),
        c AS (
          SELECT o_orderpriority, o_orderstatus AS status, count(*) AS n
          FROM orders GROUP BY 1, 2)
        SELECT p.o_orderpriority, s.status,
               coalesce(c.n, 0) AS n_orders
        FROM p CROSS JOIN s
        LEFT JOIN c ON c.o_orderpriority = p.o_orderpriority
                   AND c.status = s.status
    """,
    # bucket → dense generate_series grid → LOCF window, mirroring
    # operators/aggregations.py:gap_fill_locf (3600 s buckets)
    "gap_fill": """
        WITH actual AS (
          SELECT event_type,
                 make_timestamp(((epoch_us(ts) // 1000000) // 3600 * 3600)
                   * 1000000) AS bucket_ts,
                 sum(CAST(value AS DECIMAL(18,6))) AS val
          FROM events GROUP BY 1, 2),
        bounds AS (
          SELECT event_type, min(bucket_ts) AS b0, max(bucket_ts) AS b1
          FROM actual GROUP BY 1),
        grid AS (
          SELECT event_type,
                 unnest(generate_series(b0, b1, INTERVAL 3600 SECOND))
                   AS bucket_ts
          FROM bounds),
        j AS (
          SELECT g.event_type, g.bucket_ts, a.val
          FROM grid g LEFT JOIN actual a USING (event_type, bucket_ts))
        SELECT event_type, bucket_ts, val IS NULL AS is_gap,
               CAST(round(last_value(val IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY bucket_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                 AS DOUBLE) AS total_value
        FROM j
    """,
    # same md5-position hashing as bloom_build (k=4 seeds, m=8192); the
    # word-packed bitmap is observably identical to position-set
    # membership, which is what SQL can express directly
    "bloom_membership": """
        WITH corpus_pos AS (
          SELECT DISTINCT
                 CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)
                      || '#' || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 8192 AS p
          FROM (SELECT DISTINCT o_custkey FROM orders),
               (SELECT unnest([0,1,2,3]) AS i)),
        probe AS (
          SELECT c_custkey, c_mktsegment,
                 bool_and(
                   CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)
                        || '#' || CAST(i AS VARCHAR)), 1, 12)) AS BIGINT) % 8192
                   IN (SELECT p FROM corpus_pos)) AS mc
          FROM customer, (SELECT unnest([0,1,2,3]) AS i)
          GROUP BY c_custkey, c_mktsegment)
        SELECT c_mktsegment, count(*) AS n_probed,
               CAST(sum(CASE WHEN mc THEN 1 ELSE 0 END) AS BIGINT) AS n_might,
               CAST(sum(CASE WHEN c_custkey IN
                    (SELECT DISTINCT o_custkey FROM orders)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_members
        FROM probe GROUP BY c_mktsegment
    """,
    # identical IEEE double expressions in the identical order — bin
    # assignment, cumulative ranks, and interpolation all reproduce
    # bit-for-bit (mirrors value_histogram/histogram_quantiles, B=128)
    "histogram_quantiles": """
        WITH vals AS (
          SELECT o_orderstatus AS g, CAST(o_totalprice AS DOUBLE) AS x
          FROM orders WHERE o_totalprice IS NOT NULL),
        e AS (SELECT g, min(x) AS mn, max(x) AS mx FROM vals GROUP BY g),
        binned AS (
          SELECT vals.g, mn, mx,
                 CASE WHEN mx = mn THEN 0
                      ELSE CAST(least(floor((x - mn) / (mx - mn) * 128), 127)
                                AS INT) END AS bin
          FROM vals JOIN e ON vals.g = e.g),
        hist AS (
          SELECT g, mn, mx, bin, count(*) AS cnt
          FROM binned GROUP BY g, mn, mx, bin),
        c AS (
          SELECT g, mn, mx, bin, cnt,
                 sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
                 sum(cnt) OVER (PARTITION BY g ORDER BY bin) - cnt AS cum_before,
                 sum(cnt) OVER (PARTITION BY g) AS total
          FROM hist),
        qs AS (SELECT CAST(unnest([0.5, 0.95]) AS DOUBLE) AS q)
        SELECT g AS o_orderstatus, q,
               round(least(mn + (bin + (q * total - cum_before) / cnt)
                           * ((mx - mn) / 128), mx), 4) AS est
        FROM c, qs
        WHERE cum >= q * total AND cum_before < q * total
    """,
    # same md5-fraction hashing, same bottom-k, same (k-1)/h_k estimator
    # (mirrors operators/aggregations.py:kmv_distinct, k=64)
    "kmv_distinct": """
        WITH hashed AS (
          SELECT DISTINCT o_orderstatus,
                 CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 12)) AS BIGINT)
                   / 281474976710656.0 AS h
          FROM orders),
        ranked AS (
          SELECT o_orderstatus, h,
                 row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) AS rn
          FROM hashed),
        kept AS (SELECT * FROM ranked WHERE rn <= 64)
        SELECT o_orderstatus,
               count(*) AS n_kept,
               round(max(h), 9) AS kth_frac,
               round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                          ELSE 63.0 / max(h) END, 2) AS est_distinct
        FROM kept GROUP BY o_orderstatus
    """,
    # level-from-level re-aggregation is algebra-invariant for decimal
    # sums and counts → the oracle computes every level straight from raw
    "ht_rollup": """
        SELECT 'hour' AS level, date_trunc('hour', ts) AS bucket_ts,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'day', date_trunc('day', ts), count(*),
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'month', date_trunc('month', ts), count(*),
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
        FROM events GROUP BY 2
    """,
    # banding is algebra-invariant → the oracle is the plain BETWEEN join
    "j8_range_join": """
        WITH promo AS (
          SELECT o_orderkey,
                 date_diff('day', DATE '1992-01-01', o_orderdate) AS d
          FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5),
        li AS (
          SELECT date_diff('day', DATE '1992-01-01', l_shipdate) AS p,
                 l_quantity
          FROM lineitem)
        SELECT o_orderkey, count(*) AS n_items,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
        FROM promo JOIN li ON li.p BETWEEN promo.d AND promo.d + 30
        GROUP BY o_orderkey
    """,
    # salting is algebra-invariant → the oracle is the UNsalted query
    "skew_salted_sum": """
        SELECT l_returnflag,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "skew_salted_join": """
        SELECT o_orderstatus, count(*) AS n_items,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    "a7_rollup": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value,
               CAST(floor(quantile_cont(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE), 0.5) + 0.5) AS DOUBLE) / 100 AS p50_value
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "e1_except_keys": """
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        AND o_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "e2_intersect_keys": """
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        AND o_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "e3_union_all": """
        SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice >= 300000
        UNION ALL
        SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 20000
    """,
    "metrics_counts": f"""
        WITH run AS (
          SELECT DISTINCT user_id FROM events
          WHERE ts >= TIMESTAMP '{WIN_START}' AND ts < TIMESTAMP '{WIN_END}'),
        ex AS (SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '{WIN_START}'),
        t AS (
          SELECT r.user_id, CASE WHEN e.user_id IS NULL THEN 1 ELSE 0 END AS is_new
          FROM run r LEFT JOIN ex e USING (user_id))
        SELECT CAST(sum(is_new) AS BIGINT) AS n_new,
               CAST(sum(1 - is_new) AS BIGINT) AS n_existing,
               count(*) AS n_total
        FROM t
    """,
    "f1_regex_extract": r"""
        SELECT doc_id,
               coalesce(nullif(regexp_extract(text, '\b(spark|hash|merge)\b', 1), ''),
                        'No Match') AS first_keyword
        FROM documents
    """,
    "f2_f3_normalize": r"""
        SELECT p_partkey, p_name,
               trim(regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(lower(p_name), '[^a-z\s]', ' ', 'g'),
                       '\b(city of|municipality of|city|municipality)\b', ' ', 'g'),
                     '\bgen\b', 'general', 'g'),
                   '\bsto\b', 'santo', 'g'),
                 '\s+', ' ', 'g')) AS name_norm
        FROM part
    """,
    "f6_array_join": r"""
        SELECT doc_id,
               array_to_string(string_split_regex(trim(text), '\s+')[1:5], ',') AS first_tokens
        FROM documents
    """,
    "f7_tz_manila": """
        SELECT CAST(ts + INTERVAL 8 HOUR AS DATE) AS manila_date, count(*) AS n_events
        FROM events GROUP BY 1
    """,
    "f8_tumbling_6h": """
        WITH b AS (
          SELECT make_timestamp((((epoch_us(ts) // 1000000)
                 - (epoch_us(ts) // 1000000) % 21600)) * 1000000) AS window_start,
                 value
          FROM events)
        SELECT window_start, count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        FROM b GROUP BY window_start
    """,
    "f9_month_bounds": """
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               last_day(o_orderdate) AS month_end_day,
               count(*) AS n_orders
        FROM orders GROUP BY 1, 2
    """,
    "f11_schedule_fusion": """
        SELECT event_id,
               make_timestamp(epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP))
                 + CAST(CASE CAST(event_id % 4 AS INT)
                      WHEN 0 THEN 54000 WHEN 1 THEN 41400 WHEN 2 THEN 68400
                      ELSE 0 END AS BIGINT) * 1000000) AS schedule_ts
        FROM events
    """,
    "f12_safe_cast": """
        SELECT event_id,
               CASE WHEN event_id % 3 = 0 THEN value ELSE NULL END AS safe_value,
               CAST(NULL AS TIMESTAMP) AS safe_ts
        FROM events
    """,
    "f13_resolve_name": """
        SELECT c_custkey,
               coalesce(
                 nullif(trim(CASE WHEN c_custkey % 3 = 0 THEN ' ' ELSE c_name END), ''),
                 nullif(trim(CASE WHEN c_custkey % 9 = 0 THEN ''
                             ELSE 'user' || CAST(c_custkey AS VARCHAR) || '@example.com' END), ''),
                 'Unknown Name') AS display_name
        FROM customer
    """,
    "f14_json_extract": """
        SELECT event_type,
               CAST(sum(TRY_CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               count(TRY_CAST(props->>'$.k' AS BIGINT)) AS n_with_k
        FROM events GROUP BY event_type
    """,
    "f16_iso_format": """
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS orderdate_iso
        FROM orders
    """,
    "k4_upsert_merge": """
        WITH source AS (
          SELECT * REPLACE ('X' AS o_orderstatus) FROM orders WHERE o_orderkey % 10 = 0),
        target_keep AS (
          SELECT * FROM orders
          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)),
        merged AS (
          SELECT * FROM target_keep UNION ALL SELECT * FROM source)
        SELECT o_orderstatus AS status, count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        FROM merged GROUP BY o_orderstatus
    """,
}


QUERIES = {
    "s6_sql_scan": q_s6_sql_scan,
    "s7_preview": q_s7_preview,
    "p2_project_cast_distinct": q_p2_project_cast_distinct,
    "p3_time_window": q_p3_time_window,
    "p4_filter": q_p4_filter,
    "p6_p10_hygiene": q_p6_p10_hygiene,
    "p8_derived_columns": q_p8_derived_columns,
    "j1_broadcast_enrich": q_j1_broadcast_enrich,
    "j2_anti_join": q_j2_anti_join,
    "j3_correlated_attach": q_j3_correlated_attach,
    "j4_semi_join": q_j4_semi_join,
    "j5_similarity_argmax": q_j5_similarity_argmax,
    "j6_fuzzy_threshold": q_j6_fuzzy_threshold,
    "j7_positional_join": q_j7_positional_join,
    "a1_pricing_summary": q_a1_pricing_summary,
    "a2_distinct": q_a2_distinct,
    "a3_multi_column_distinct": q_a3_multi_column_distinct,
    "a5_ordered_group_concat": q_a5_ordered_group_concat,
    "a6_first_row_pick": q_a6_first_row_pick,
    "w2_topk_per_group": q_w2_topk_per_group,
    "w3_ordered_limit": q_w3_ordered_limit,
    "w4_lag_lead": q_w4_lag_lead,
    "w5_rolling_window": q_w5_rolling_window,
    "w6_asof_join": q_w6_asof_join,
    "w7_sessionize": q_w7_sessionize,
    "gap_fill": q_gap_fill,
    "pivot_unpivot": q_pivot_unpivot,
    "zscore": q_zscore,
    "profile_columns": q_profile_columns,
    "validate_expectations": q_validate_expectations,
    "table_diff": q_table_diff,
    "funnel": q_funnel,
    "retention_cohorts": q_retention_cohorts,
    "entity_resolution": q_entity_resolution,
    "entity_resolution_multi": q_entity_resolution_multi,
    "entity_resolution_name": q_entity_resolution_name,
    "entity_resolution_inc": q_entity_resolution_inc,
    "j8_range_join": q_j8_range_join,
    "ht_rollup": q_ht_rollup,
    "kmv_distinct": q_kmv_distinct,
    "bloom_membership": q_bloom_membership,
    "histogram_quantiles": q_histogram_quantiles,
    "a7_rollup": q_a7_rollup,
    "skew_salted_sum": q_skew_salted_sum,
    "skew_salted_join": q_skew_salted_join,
    "e1_except_keys": q_e1_except_keys,
    "e2_intersect_keys": q_e2_intersect_keys,
    "e3_union_all": q_e3_union_all,
    "metrics_counts": q_metrics_new_vs_existing,
    "f1_regex_extract": q_f1_regex_extract,
    "f2_f3_normalize": q_f2_f3_normalize,
    "f6_array_join": q_f6_array_join,
    "f7_tz_manila": q_f7_tz_manila,
    "f8_tumbling_6h": q_f8_tumbling_6h,
    "f9_month_bounds": q_f9_month_bounds,
    "f11_schedule_fusion": q_f11_schedule_fusion,
    "f12_safe_cast": q_f12_safe_cast,
    "f13_resolve_name": q_f13_resolve_name,
    "f14_json_extract": q_f14_json_extract,
    "f16_iso_format": q_f16_iso_format,
    "k4_upsert_merge": q_k4_upsert_merge,
}
