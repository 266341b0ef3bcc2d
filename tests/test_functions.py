"""Unit tests for the scalar expression libraries (F1-F16)."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.functions.datetimes import (
    fuse_schedule,
    to_iso,
    to_manila,
    tumbling_6h_bucket,
)
from mgo_liveagent_data_pipeline_spark.functions.similarity import (
    char_ngrams,
    jaccard,
    levenshtein_ratio,
    word_shingles,
)
from mgo_liveagent_data_pipeline_spark.functions.strings import (
    clean_str,
    extract_reference_code,
    normalize_location,
    resolve_name,
)


def one(df):
    return df.collect()[0][0]


def test_extract_reference_code(spark):
    df = spark.createDataFrame(
        [("please see Ref: AB12 thanks",), ("no code here",)], ["msg"]
    )
    out = df.select(extract_reference_code("msg").alias("c")).collect()
    assert out[0]["c"] == "AB12"
    assert out[1]["c"] == "No Reference code"


def test_clean_str_and_normalize(spark):
    df = spark.createDataFrame([("City of Señor GEN Trias",)], ["s"])
    assert one(df.select(clean_str("s"))) == "city of senor gen trias"
    # diacritics are clean_str's job (ingest-side encoding fix, like the
    # reference); normalize_location runs on the cleaned text
    assert one(df.select(normalize_location(clean_str("s")))) == "senor general trias"


def test_resolve_name_chain(spark):
    df = spark.createDataFrame(
        [(" ", "a@b.c"), ("", ""), ("Ana", "x@y.z")], ["n", "e"]
    )
    got = [r["d"] for r in df.select(resolve_name("n", "e").alias("d")).collect()]
    assert got == ["a@b.c", "Unknown Name", "Ana"]


def test_char_ngrams_short_string(spark):
    df = spark.createDataFrame([("ab",), ("abcd",)], ["s"])
    out = df.select(char_ngrams("s", 3).alias("g")).collect()
    assert out[0]["g"] == ["ab"]  # shorter than n → the string itself
    assert out[1]["g"] == ["abc", "bcd"]


def test_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame([(["a", "b"], ["a", "b"], ["c"])], ["x", "y", "z"])
    row = df.select(
        jaccard(F.col("x"), F.col("y")).alias("same"),
        jaccard(F.col("x"), F.col("z")).alias("disj"),
    ).collect()[0]
    assert row["same"] == 1.0
    assert row["disj"] == 0.0


def test_levenshtein_ratio_bounds(spark):
    df = spark.createDataFrame([("kitten", "kitten"), ("abc", "xyz")], ["a", "b"])
    got = [
        r["r"] for r in df.select(levenshtein_ratio("a", "b").alias("r")).collect()
    ]
    assert got[0] == 100.0
    assert got[1] == 0.0


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["s"])
    assert one(df.select(word_shingles("s", 2))) == ["a b", "b c", "c d"]


def test_to_manila_is_plus_8(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 1, 0, 0),)], ["ts"])
    assert one(df.select(to_manila("ts"))) == dt.datetime(2024, 1, 1, 8, 0)


def test_tumbling_6h_bucket(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 7, 59),), (dt.datetime(2024, 1, 1, 12, 0),)],
        ["ts"],
    )
    got = [r[0] for r in df.select(tumbling_6h_bucket("ts")).collect()]
    assert got == [dt.datetime(2024, 1, 1, 6, 0), dt.datetime(2024, 1, 1, 12, 0)]


def test_fuse_schedule_formats(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-15", "3PM"),
            ("2024-01-15", "11:30 am"),
            ("2024-01-15", "garbage"),
            (None, "3PM"),
        ],
        ["d", "t"],
    )
    got = [r[0] for r in df.select(fuse_schedule("d", "t")).collect()]
    assert got == [
        dt.datetime(2024, 1, 15, 15, 0),
        dt.datetime(2024, 1, 15, 11, 30),
        dt.datetime(2024, 1, 15, 0, 0),  # unparseable time → midnight
        None,  # no date → null (reference null-safety)
    ]


def test_to_iso(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 5, 6, 7, 8, 9),)], ["ts"])
    assert one(df.select(to_iso("ts"))) == "2024-05-06T07:08:09"
