"""Sink property tests — K4 idempotence is SURVEY §5.4's headline property."""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.sinks.writers import (
    append,
    ensure_table,
    history_append,
    overwrite,
    table_path,
    upsert,
)


def seed(spark, tmp, rows):
    df = spark.createDataFrame(rows, ["id", "v"])
    overwrite(df, tmp, "t")
    return df


def read(spark, tmp, name="t"):
    return spark.read.parquet(table_path(tmp, name))


def test_ensure_table_creates_empty_once(spark, tmp_path):
    tmp = str(tmp_path)
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    ensure_table(spark, tmp, "t", df)
    assert read(spark, tmp).count() == 0
    # second call is a no-op even with different data
    ensure_table(spark, tmp, "t", df.withColumn("v", F.lit("zzz")))
    assert read(spark, tmp).count() == 0


def test_upsert_updates_and_inserts(spark, tmp_path):
    tmp = str(tmp_path)
    seed(spark, tmp, [(1, "old"), (2, "keep")])
    src = spark.createDataFrame([(1, "new"), (3, "ins")], ["id", "v"])
    upsert(spark, src, tmp, "t", "id")
    got = {r["id"]: r["v"] for r in read(spark, tmp).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_upsert_idempotent(spark, tmp_path):
    tmp = str(tmp_path)
    seed(spark, tmp, [(1, "old"), (2, "keep")])
    src = spark.createDataFrame([(1, "new"), (3, "ins")], ["id", "v"])
    upsert(spark, src, tmp, "t", "id")
    once = sorted(map(tuple, read(spark, tmp).collect()))
    upsert(spark, src, tmp, "t", "id")
    twice = sorted(map(tuple, read(spark, tmp).collect()))
    assert once == twice


def test_upsert_creates_missing_target(spark, tmp_path):
    tmp = str(tmp_path)
    src = spark.createDataFrame([(1, "a")], ["id", "v"])
    upsert(spark, src, tmp, "t", "id")
    assert read(spark, tmp).count() == 1


def test_history_append_accumulates(spark, tmp_path):
    tmp = str(tmp_path)
    batch = spark.createDataFrame([(1, "a")], ["id", "v"])
    history_append(spark, batch, tmp, "t")
    history_append(spark, batch, tmp, "t")
    assert read(spark, tmp, "t_history").count() == 2


def test_append_then_overwrite(spark, tmp_path):
    tmp = str(tmp_path)
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    append(df, tmp, "t")
    append(df, tmp, "t")
    assert read(spark, tmp).count() == 2
    overwrite(df, tmp, "t")
    assert read(spark, tmp).count() == 1
    assert not os.path.exists(table_path(tmp, "t") + ".old")


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    from mgo_liveagent_data_pipeline_spark.sinks.writers import write_bucketed

    tmp = str(tmp_path)
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    lname = write_bucketed(spark, left, tmp, "bkt_left", "k", 4)
    rname = write_bucketed(spark, right, tmp, "bkt_right", "k", 4)
    assert lname != "bkt_left"  # namespaced per base_dir
    try:
        # merge hint: at this toy size Spark would broadcast; production
        # fact-fact sizes take the sort-merge path this test asserts on
        joined = spark.table(lname).hint("merge").join(
            spark.table(rname).hint("merge"), "k"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        # co-located buckets: the merge join runs with NO exchange at all
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lname}")
        spark.sql(f"DROP TABLE IF EXISTS {rname}")


def test_versioned_table_atomic_pointer_flip(spark, tmp_path):
    import os

    from mgo_liveagent_data_pipeline_spark.sinks.writers import (
        _versioned_dir,
        read_versioned,
        versioned_upsert,
        versioned_write,
    )

    tmp = str(tmp_path)
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    versioned_write(v1, tmp, "t")
    assert read_versioned(spark, tmp, "t").count() == 2

    # a fully-written but uncommitted version is invisible to readers
    vdir = _versioned_dir(tmp, "t")
    orphan = os.path.join(vdir, "v_99")
    spark.createDataFrame([(9, "x")], ["id", "v"]).write.parquet(orphan)
    assert read_versioned(spark, tmp, "t").count() == 2

    # upsert publishes atomically; the pointer always names a version
    src = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    versioned_upsert(spark, src, tmp, "t", "id")
    versioned_upsert(spark, src, tmp, "t", "id")  # idempotent
    rows = {r["id"]: r["v"] for r in read_versioned(spark, tmp, "t").collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}
    cur = open(os.path.join(vdir, "_CURRENT")).read()
    assert os.path.isdir(os.path.join(vdir, cur))


def test_writer_lease_breaks_stale_lock(spark, tmp_path):
    """A lock file left by a crashed writer (older than the TTL) is broken
    by the next writer instead of wedging the table forever."""
    import os
    import time as _time

    from mgo_liveagent_data_pipeline_spark.sinks import writers
    from mgo_liveagent_data_pipeline_spark.sinks.writers import (
        _versioned_dir,
        read_versioned,
        versioned_write,
    )

    tmp = str(tmp_path)
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    versioned_write(df, tmp, "t")
    vdir = _versioned_dir(tmp, "t")
    lock = os.path.join(vdir, "_LOCK")
    # simulate a crashed holder: lock exists, mtime far in the past
    with open(lock, "w") as f:
        f.write("99999")
    stale = _time.time() - (writers._LEASE_TTL_S + 60)
    os.utime(lock, (stale, stale))
    versioned_write(df.withColumn("v", F.lit("b")), tmp, "t")  # must not hang
    rows = {r["v"] for r in read_versioned(spark, tmp, "t").collect()}
    assert rows == {"b"}
    assert not os.path.exists(lock)


def test_versioned_upsert_concurrent_writers(spark, tmp_path):
    """Two writers upserting DISJOINT key ranges at the same time: the
    writer lease serializes the read-merge-publish cycles, so neither
    update is lost and _CURRENT always names a complete version."""
    import os
    import threading

    from mgo_liveagent_data_pipeline_spark.sinks.writers import (
        _versioned_dir,
        read_versioned,
        versioned_upsert,
        versioned_write,
    )

    tmp = str(tmp_path)
    versioned_write(
        spark.createDataFrame([(0, "base")], ["id", "v"]), tmp, "t", keep=10
    )

    errors: list[Exception] = []

    def writer(lo: int):
        try:
            src = spark.createDataFrame(
                [(lo + i, f"w{lo}") for i in range(5)], ["id", "v"]
            )
            versioned_upsert(spark, src, tmp, "t", "id", keep=10)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(lo,)) for lo in (100, 200)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    rows = {r["id"]: r["v"] for r in read_versioned(spark, tmp, "t").collect()}
    # base row + both writers' disjoint batches all survive
    assert rows[0] == "base"
    assert all(rows[100 + i] == "w100" for i in range(5))
    assert all(rows[200 + i] == "w200" for i in range(5))
    vdir = _versioned_dir(tmp, "t")
    cur = open(os.path.join(vdir, "_CURRENT")).read()
    assert os.path.isdir(os.path.join(vdir, cur))
    assert not os.path.exists(os.path.join(vdir, "_LOCK"))  # lease released
