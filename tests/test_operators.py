"""Unit + property tests for join/aggregation/window/setop operators."""
from __future__ import annotations

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
    distinct_ids_from_columns,
    first_row_pick,
    ordered_group_concat,
)
from mgo_liveagent_data_pipeline_spark.operators.joins import (
    broadcast_enrich,
    fuzzy_threshold_join,
    missing_keys,
    semi_join,
    similarity_join_argmax,
    two_phase_similarity_join,
)
from mgo_liveagent_data_pipeline_spark.operators.setops import (
    new_vs_existing_counts,
    union_all,
)
from mgo_liveagent_data_pipeline_spark.operators.windows import (
    argmax,
    ordered_limit,
    top_k_per_group,
)


def test_broadcast_enrich_left(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    dim = spark.createDataFrame([(1, "X"), (2, "Y")], ["id", "name"])
    out = broadcast_enrich(fact, dim, "k", "id").orderBy("k").collect()
    assert [r["name"] for r in out] == ["X", "Y", None]


def test_missing_and_semi(spark):
    cand = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    known = spark.createDataFrame([(2,)], ["id"])
    assert [r["id"] for r in missing_keys(cand, known, "id").collect()] == [1, 3]
    assert [r["id"] for r in semi_join(cand, known, "id").collect()] == [2]


def test_similarity_argmax_excludes_self_and_breaks_ties(spark):
    left = spark.createDataFrame([("abcdef",)], ["name"])
    right = spark.createDataFrame(
        [("abcdef",), ("abcdex",), ("abcdey",)], ["cand"]
    )
    out = similarity_join_argmax(
        left, right, "name", "cand", n=3, threshold=0.1, exclude_self=True
    ).collect()
    assert len(out) == 1
    # self-match excluded; tie between abcdex/abcdey broken by smaller value
    assert out[0]["cand"] == "abcdex"
    assert out[0]["score"] < 1.0


def test_similarity_argmax_threshold_filters_all(spark):
    left = spark.createDataFrame([("aaaa",)], ["name"])
    right = spark.createDataFrame([("zzzz",)], ["cand"])
    out = similarity_join_argmax(left, right, "name", "cand", n=2, threshold=0.5)
    assert out.count() == 0


def test_two_phase_similarity_same_colname_no_ambiguity(spark):
    addrs = spark.createDataFrame([("santa rosa",)], ["address"])
    gaz = spark.createDataFrame(
        [
            ("santa rosa", "municity", 10, 1),
            ("laguna", "provdist", -1, 1),
            ("santa rosa east", "barangay", 10, 1),
            ("faraway", "barangay", 99, 9),
        ],
        ["address", "geo_level", "municity_code", "provdist_code"],
    )
    out = two_phase_similarity_join(addrs, gaz, n=3).collect()
    assert len(out) == 1
    assert out[0]["matched_address"] == "santa rosa"


def test_fuzzy_threshold_join_flags(spark):
    left = spark.createDataFrame([("manila",), ("zzzzz",)], ["loc"])
    right = spark.createDataFrame([("manila",), ("cebu",)], ["serviceable"])
    out = {
        r["loc"]: r["viable"]
        for r in fuzzy_threshold_join(
            left, right, "loc", "serviceable", threshold=90.0
        ).collect()
    }
    assert out == {"manila": "Yes", "zzzzz": "No"}


def test_ordered_group_concat_is_order_invariant(spark):
    rows = [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "x")]
    df = spark.createDataFrame(rows, ["k", "seq", "txt"])
    expected = {1: "a|b|c", 2: "x"}
    for parts in (1, 4):
        out = ordered_group_concat(
            df.repartition(parts), "k", ["seq"], "txt", sep="|", out="s"
        ).collect()
        assert {r["k"]: r["s"] for r in out} == expected


def test_distinct_ids_from_columns(spark):
    df = spark.createDataFrame([(1, 2), (2, None), (3, 1)], ["a", "b"])
    got = sorted(
        r["id"] for r in distinct_ids_from_columns(df, ["a", "b"]).collect()
    )
    assert got == [1, 2, 3]


def test_first_row_pick(spark):
    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], ["o", "v"])
    assert first_row_pick(df, "o", ["v"]).collect()[0]["v"] == "a"


def test_top_k_and_argmax_agree(spark):
    df = spark.createDataFrame(
        [("g", 1.0, "p"), ("g", 5.0, "q"), ("g", 5.0, "r"), ("h", 2.0, "s")],
        ["grp", "score", "payload"],
    )
    top = top_k_per_group(
        df, ["grp"], [F.desc("score"), F.asc("payload")], k=1
    ).collect()
    top_map = {r["grp"]: r["payload"] for r in top}
    am = argmax(df, ["grp"], "score", ["payload"]).collect()
    am_map = {r["grp"]: r["payload"] for r in am}
    assert top_map["h"] == am_map["h"] == "s"
    # ties: window picks payload asc 'q'; argmax max_by struct picks the
    # max tiebreak — both deterministic
    assert top_map["g"] == "q"
    assert am_map["g"] in {"q", "r"}


def test_ordered_limit(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["x"])
    out = ordered_limit(df, [F.desc("x")], 3).collect()
    assert [r["x"] for r in out] == [99, 98, 97]


def test_setops_and_metrics(spark):
    run = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    ex = spark.createDataFrame([(2,), (9,)], ["id"])
    m = new_vs_existing_counts(run, ex, "id").collect()[0]
    assert (m["n_new"], m["n_existing"], m["n_total"]) == (2, 1, 3)
    u = union_all([run, ex])
    assert u.count() == 5


def test_sessionize_gap_boundaries_and_single_shuffle(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.windows import sessionize

    rows = [
        # user 1: 3 events within gap, then a >gap jump -> 2 sessions
        (1, 1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (2, 1, datetime(2024, 1, 1, 0, 10, 0), 2.0),
        (3, 1, datetime(2024, 1, 1, 0, 20, 0), 3.0),
        (4, 1, datetime(2024, 1, 1, 5, 0, 0), 4.0),
        # user 2: exact-gap spacing stays in ONE session (<= is inclusive)
        (5, 2, datetime(2024, 1, 1, 0, 0, 0), 5.0),
        (6, 2, datetime(2024, 1, 1, 1, 0, 0), 6.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = sessionize(df, "user_id", "ts", gap_seconds=3600,
                     tiebreak_col="event_id")
    got = {r["event_id"]: r["session_no"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1}

    # sessionize + per-session agg must be ONE shuffle end-to-end: the
    # (user_id, session_no) groupBy reuses the window's hash partitioning
    agg = out.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_table_diff_classifies_all_four_ways(spark):
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from mgo_liveagent_data_pipeline_spark.operators.setops import table_diff

    schema = StructType([
        StructField("k", LongType()),
        StructField("a", StringType()),
        StructField("b", DoubleType()),
    ])
    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, None, 3.0), (4, "gone", 4.0)],
        schema,
    )
    new = spark.createDataFrame(
        [(1, "x", 1.0),        # unchanged
         (2, "y", 9.0),        # changed: b
         (3, "now", 30.0),     # changed: a (NULL -> value) and b
         (5, "fresh", 5.0)],   # added
        schema,
    )
    out = {r["k"]: (r["diff_status"], r["n_changed_cols"])
           for r in table_diff(old, new, ["k"], ["a", "b"]).collect()}
    assert out == {
        1: ("unchanged", 0),
        2: ("changed", 1),
        3: ("changed", 2),   # null-safe: NULL->'now' counts
        4: ("removed", 0),
        5: ("added", 0),
    }


def test_profile_columns_single_pass_stats(spark):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        profile_columns,
    )

    schema = StructType([
        StructField("s", StringType()),
        StructField("n", LongType()),
    ])
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", None), (None, 2), (None, 2)], schema
    )
    out = {r["column"]: r for r in profile_columns(df, ["s", "n"]).collect()}
    s = out["s"]
    assert (s["n_rows"], s["n_null"], s["n_distinct"]) == (5, 2, 2)
    assert (s["top_value"], s["top_n"]) == ("a", 2)
    n = out["n"]
    assert (n["n_rows"], n["n_null"], n["n_distinct"]) == (5, 1, 2)
    assert (n["top_value"], n["top_n"]) == ("2", 3)


def test_funnel_ordered_within_window(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.behavior import funnel

    H = 3600
    rows = [
        # u1 converts fully in order
        (1, "view", datetime(2024, 1, 1, 0)),
        (1, "click", datetime(2024, 1, 1, 1)),
        (1, "buy", datetime(2024, 1, 1, 2)),
        # u2 clicks BEFORE viewing -> click must not count
        (2, "click", datetime(2024, 1, 1, 0)),
        (2, "view", datetime(2024, 1, 1, 1)),
        # u3 views then clicks too late (outside the window)
        (3, "view", datetime(2024, 1, 1, 0)),
        (3, "click", datetime(2024, 1, 3, 0)),
        # u4 never views; later steps can't count
        (4, "click", datetime(2024, 1, 1, 0)),
        (4, "buy", datetime(2024, 1, 1, 1)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["step"]: (r["step_no"], r["n_users"]) for r in funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "buy"],
        within_seconds=2 * H,
    ).collect()}
    assert out == {"view": (1, 3), "click": (2, 1), "buy": (3, 1)}


def test_funnel_window_keeps_fractional_seconds(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.behavior import funnel

    # view at .600; click at exactly view+window but landing INSIDE the
    # window only because the bound keeps the fractional part — a
    # unix_timestamp-based bound truncates .600 away and drops it
    rows = [
        (1, "view", datetime(2024, 1, 1, 0, 0, 0, 600000)),
        (1, "click", datetime(2024, 1, 1, 1, 0, 0, 400000)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["step"]: r["n_users"] for r in funnel(
        df, "user_id", "ts", "event_type", ["view", "click"],
        within_seconds=3600,
    ).collect()}
    assert out == {"view": 1, "click": 1}


def test_funnel_many_steps_linear_plan(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.behavior import funnel

    # 12 steps: would be ~2^12 expression nodes under inlined recurrence;
    # the chained-attribute form must build and run fine
    steps = [f"s{i}" for i in range(12)]
    rows = [(1, s, datetime(2024, 1, 1, 0, i)) for i, s in enumerate(steps)]
    rows += [(2, s, datetime(2024, 1, 1, 0, i))
             for i, s in enumerate(steps[:5])]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["step_no"]: r["n_users"] for r in funnel(
        df, "user_id", "ts", "event_type", steps, within_seconds=3600,
    ).collect()}
    assert out == {i + 1: (2 if i < 5 else 1) for i in range(12)}


def test_retention_cohorts_dst_week_not_misbucketed(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.behavior import (
        retention_cohorts,
    )

    # America/New_York spring-forward week (2024-03-10): the week from
    # Mon 03-04 to Mon 03-11 is 601200 s long, so epoch-second
    # arithmetic floors week 1 down to week 0 — calendar-day math must
    # not
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [
            (1, datetime(2024, 3, 5)),   # cohort week Mon 03-04
            (1, datetime(2024, 3, 12)),  # active week Mon 03-11
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        out = {(str(r["cohort_week"].date()), r["week_no"]): r["n_users"]
               for r in retention_cohorts(df, "user_id", "ts").collect()}
        assert out == {("2024-03-04", 0): 1, ("2024-03-04", 1): 1}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_retention_cohorts_single_user_shuffle(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.behavior import (
        retention_cohorts,
    )

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 2)), (1, datetime(2024, 1, 9))],
        ["user_id", "ts"],
    )
    out = retention_cohorts(df, "user_id", "ts")
    # one corpus shuffle on user_id + one rollup shuffle — the old
    # distinct-plus-join shape paid a third exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan


def test_table_diff_key_only(spark):
    from mgo_liveagent_data_pipeline_spark.operators.setops import table_diff

    old = spark.createDataFrame([(1,), (2,)], ["k"])
    new = spark.createDataFrame([(2,), (3,)], ["k"])
    out = {r["k"]: r["diff_status"]
           for r in table_diff(old, new, ["k"], []).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "added"}


def test_retention_cohorts_triangle(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.behavior import (
        retention_cohorts,
    )

    # weeks: 2024-01-01 (Mon), 2024-01-08, 2024-01-15
    rows = [
        (1, datetime(2024, 1, 2)),   # cohort w0
        (1, datetime(2024, 1, 9)),   # active w1
        (1, datetime(2024, 1, 16)),  # active w2
        (2, datetime(2024, 1, 3)),   # cohort w0, never returns
        (3, datetime(2024, 1, 10)),  # cohort w1
        (3, datetime(2024, 1, 17)),  # active w1+1
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(str(r["cohort_week"].date()), r["week_no"]): r["n_users"]
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_validate_expectations_semantics(spark):
    """The gate's verdict semantics: NULLs violate range/set/pattern
    checks (use not_null when NULLs are legal), unique counts repeats,
    row_count_between reports distance to the nearest bound, unknown
    kinds are refused."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        validate_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", None), (3, None, 50.0), (3, "b", 7.0)],
        "k long, s string, v double",
    )
    out = {
        (r["check"], r["column"]): (r["violations"], r["n_rows"], r["passed"])
        for r in validate_expectations(
            df,
            [
                ("not_null", "s"),
                ("unique", "k"),          # 3 appears twice -> 1 repeat
                ("between", "v", 0.0, 10.0),  # 50 out of range + NULL -> 2
                ("values_in", "s", ("a", "b")),  # NULL violates -> 1
                ("matches", "s", "^a$"),  # 'b' + NULL -> 2
                ("row_count_between", 1, 2),  # 4 rows -> distance 2
                ("row_count_between", 1, 10),  # pass
            ],
        ).collect()
    }
    assert out[("not_null", "s")] == (1, 4, False)
    assert out[("unique", "k")] == (1, 4, False)
    assert out[("between", "v")] == (2, 4, False)
    assert out[("values_in", "s")] == (1, 4, False)
    assert out[("matches", "s")] == (2, 4, False)
    assert out[("row_count_between[1,2]", "")] == (2, 4, False)
    assert out[("row_count_between[1,10]", "")] == (0, 4, True)

    with pytest.raises(ValueError):
        validate_expectations(df, [("no_such_kind", "k")])

    # the EMPTY table: 0 violations everywhere except the row-count
    # lower bound — a NULL verdict here would mis-quarantine empty
    # replay batches in stream_gated_ingest
    empty = df.where("k < 0")
    eout = {
        (r["check"], r["column"]): (r["violations"], r["passed"])
        for r in validate_expectations(
            empty,
            [
                ("not_null", "s"),
                ("between", "v", 0.0, 10.0),
                ("row_count_between", 1, 10),
            ],
        ).collect()
    }
    assert eout[("not_null", "s")] == (0, True)
    assert eout[("between", "v")] == (0, True)
    assert eout[("row_count_between[1,10]", "")] == (1, False)
