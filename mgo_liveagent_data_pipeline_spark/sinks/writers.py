"""Sink operators — the reference's BigQuery load path re-expressed as
parquet-table writes (K1-K6).

Reference counterparts:
* K1 ensure dataset/table (core/BigQueryManager.py:22-45)
* K2 append / overwrite load with write disposition
  (core/BigQueryManager.py:47-70)
* K4 staged MERGE upsert: load staging → MERGE on key → drop staging
  (core/extract/helpers/extractor_bq_helpers.py:40-185)
* K5 history append before merge (extractor_bq_helpers.py:83-108)
* K6 orchestrated prepare-and-load (extractor_bq_helpers.py:13-38)

Tables are parquet directories (swap for Delta in production — ``upsert``
becomes ``MERGE INTO`` and the read-modify-write below collapses to a
transactional command; the call-sites don't change).

Scale notes baked in:
* the merge is anti-join + unionByName — the standard non-transactional
  merge shape; the anti-join shuffles only the key column of the target
  thanks to column pruning until the union projection.
* before the overwrite the result is repartitionByRange on the key, so
  file sizes stay balanced and downstream key-range scans prune files
  (SURVEY §4: repartitionByRange before MERGE).
* writes go to a temp sibling directory then a two-rename swap — a re-run
  that dies mid-write never *loses committed data* (the next write
  restores the ``.old`` copy if the swap window was interrupted; see
  ``_atomic_overwrite`` for the exact non-atomicity window). The
  reference gets the stronger transactional guarantee from BigQuery
  staging tables; swap in Delta for the same here.
"""
from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_path(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, f"{name}.parquet")


def ensure_table(
    spark: SparkSession, base_dir: str, name: str, template: DataFrame
) -> str:
    """K1: create-if-absent — an empty parquet table with the template's
    schema (CREATE TABLE IF NOT EXISTS)."""
    path = table_path(base_dir, name)
    if not os.path.exists(path):
        os.makedirs(base_dir, exist_ok=True)
        template.limit(0).write.mode("overwrite").parquet(path)
    return path


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    """Write to a temp sibling, then swap via two renames.

    NOT truly atomic: between ``rename(path, .old)`` and
    ``rename(staged, path)`` the table path briefly does not exist, so a
    crash in that window (or a concurrent lister) can see a missing
    table. The next write self-heals: if ``path`` is gone but ``.old``
    survives, ``.old`` is restored before proceeding, so no committed
    data is ever lost — the guarantee is durability, not an atomic swap.
    True atomicity needs a versioned directory + pointer-file scheme or a
    transactional format (the documented Delta swap); single-directory
    parquet keeps the driver-checkable layout.
    """
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    old = path + ".old"
    # crash recovery: a previous run died inside its swap window
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".staging_")
    staged = os.path.join(tmp, "data")
    try:
        df.write.mode("overwrite").parquet(staged)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staged, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def append(df: DataFrame, base_dir: str, name: str) -> str:
    """K2 WRITE_APPEND."""
    path = table_path(base_dir, name)
    df.write.mode("append").parquet(path)
    return path


def overwrite(df: DataFrame, base_dir: str, name: str) -> str:
    """K2 WRITE_TRUNCATE."""
    path = table_path(base_dir, name)
    _atomic_overwrite(df, path)
    return path


def upsert(
    spark: SparkSession,
    source: DataFrame,
    base_dir: str,
    name: str,
    key: str,
    num_range_partitions: int | None = None,
) -> str:
    """K4: staged MERGE upsert — target rows whose key appears in source
    are replaced; new source keys are inserted. Idempotent: running the
    same source twice equals running it once.

    Plan: target ⟮left-anti on key⟯ source → unionByName(source) →
    repartitionByRange(key) → atomic overwrite. With Delta this whole
    function is ``MERGE INTO t USING s ON t.key=s.key WHEN MATCHED THEN
    UPDATE SET * WHEN NOT MATCHED THEN INSERT *``.
    """
    path = table_path(base_dir, name)
    if not os.path.exists(path):
        # empty-target fast path: an absent table anti-joins to nothing,
        # so MERGE degenerates to writing the source — skips the
        # create-empty + read + anti-join jobs on a table's first batch
        merged = source
    else:
        target = spark.read.parquet(path)
        merged = target.join(
            source.select(key).distinct(), on=key, how="left_anti"
        ).unionByName(source)
    if num_range_partitions:
        merged = merged.repartitionByRange(num_range_partitions, F.col(key))
    # safe to read-while-writing: the staging write happens before the
    # swap, so the lazy plan still sees the old target files
    _atomic_overwrite(merged, path)
    return path


def history_append(
    spark: SparkSession, df: DataFrame, base_dir: str, name: str
) -> str:
    """K5: append-only history table ``<name>_history`` written before the
    current-state merge (extractor_bq_helpers.py:83-108)."""
    hist = f"{name}_history"
    ensure_table(spark, base_dir, hist, df)
    return append(df, base_dir, hist)


def _versioned_dir(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, f"{name}.versioned")


# Writer-lease tuning: a lease older than the TTL is presumed abandoned by
# a crashed writer and is broken; contending writers poll at the retry
# interval. The TTL must exceed the longest plausible write+flip.
_LEASE_TTL_S = 300.0
_LEASE_RETRY_S = 0.05


class WriterLease:
    """Exclusive writer lease over a versioned table — an ``O_CREAT|O_EXCL``
    lock file, the cheap single-filesystem stand-in for the transactional
    MERGE the reference gets from BigQuery
    (core/extract/helpers/extractor_bq_helpers.py:159-169).

    A blocked writer retries until the holder releases (or its lease goes
    stale past ``_LEASE_TTL_S`` — a crashed holder cannot wedge the table
    forever). Readers never take the lease: the pointer-file commit already
    gives them a consistent snapshot. The lease only serializes WRITERS, so
    concurrent ``versioned_upsert`` calls compose: each one reads the
    version the previous commit published, and no version number or pointer
    flip is ever raced.
    """

    def __init__(self, vdir: str):
        self.path = os.path.join(vdir, "_LOCK")

    def __enter__(self) -> "WriterLease":
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    if time.time() - os.stat(self.path).st_mtime > _LEASE_TTL_S:
                        os.unlink(self.path)  # break a stale lease
                        continue
                except FileNotFoundError:
                    continue  # holder released between open and stat
                time.sleep(_LEASE_RETRY_S)

    def __exit__(self, *exc) -> None:
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass


def _allocate_version(vdir: str) -> tuple[int, list[int]]:
    """Claim the next version directory with ``os.mkdir`` (EEXIST-retry),
    so even a writer that bypasses the lease can never share a version
    directory with another writer."""
    while True:
        existing = sorted(
            int(d[2:]) for d in os.listdir(vdir)
            if d.startswith("v_") and d[2:].isdigit()
        )
        new_v = (existing[-1] + 1) if existing else 1
        try:
            os.mkdir(os.path.join(vdir, f"v_{new_v}"))
            return new_v, existing
        except FileExistsError:
            continue


def _publish_version(df: DataFrame, vdir: str, keep: int) -> str:
    """Write a new version and flip the pointer. Caller holds the lease."""
    new_v, existing = _allocate_version(vdir)
    vpath = os.path.join(vdir, f"v_{new_v}")
    df.write.mode("overwrite").parquet(vpath)
    pointer = os.path.join(vdir, "_CURRENT")
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"v_{new_v}")
    os.replace(tmp, pointer)  # the atomic commit
    # prune versions older than the kept window (current + keep-1 before)
    for v in existing[: max(0, len(existing) - (keep - 1))]:
        shutil.rmtree(os.path.join(vdir, f"v_{v}"), ignore_errors=True)
    return vpath


def versioned_write(df: DataFrame, base_dir: str, name: str, keep: int = 2) -> str:
    """Truly atomic table publish — the versioned-directory + pointer-file
    scheme ``_atomic_overwrite`` documents as its upgrade path.

    Data lands in ``<table>.versioned/v_<n>/``; the commit is ONE
    ``os.replace`` of the ``_CURRENT`` pointer file (atomic on POSIX), so
    there is no instant at which the table is missing or partial: a
    reader resolves the pointer and sees either the old complete version
    or the new complete one. A crash before the pointer flip leaves an
    orphan version directory (pruned on the next write), never a corrupt
    table. Concurrent writers are serialized by ``WriterLease`` (version
    allocation itself is additionally mkdir-atomic), so two simultaneous
    publishes commit one after the other instead of clobbering a shared
    ``v_n``. This is the single-node skeleton of what Delta/Iceberg do
    with a transaction log; ``keep`` old versions are retained for
    in-flight readers.
    """
    vdir = _versioned_dir(base_dir, name)
    os.makedirs(vdir, exist_ok=True)
    with WriterLease(vdir):
        return _publish_version(df, vdir, keep)


def read_versioned(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """Resolve the ``_CURRENT`` pointer and read that version."""
    vdir = _versioned_dir(base_dir, name)
    with open(os.path.join(vdir, "_CURRENT")) as f:
        v = f.read().strip()
    return spark.read.parquet(os.path.join(vdir, v))


def versioned_upsert(
    spark: SparkSession, source: DataFrame, base_dir: str, name: str, key: str,
    keep: int = 2,
) -> str:
    """K4 MERGE against the versioned table: read current, anti-join +
    union, publish as a new version (atomic pointer flip). Same idempotent
    semantics as ``upsert``; readers never observe an intermediate state.

    The WHOLE read-merge-publish runs under the writer lease, so two
    concurrent upserts serialize: the second reads the version the first
    committed and neither's rows are lost (the lost-update anomaly the
    reference avoids via BigQuery's transactional MERGE,
    extractor_bq_helpers.py:159-169).
    """
    vdir = _versioned_dir(base_dir, name)
    os.makedirs(vdir, exist_ok=True)
    with WriterLease(vdir):
        if not os.path.exists(os.path.join(vdir, "_CURRENT")):
            return _publish_version(source, vdir, keep)
        target = read_versioned(spark, base_dir, name)
        merged = target.join(
            source.select(key).distinct(), on=key, how="left_anti"
        ).unionByName(source)
        return _publish_version(merged, vdir, keep)


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    base_dir: str,
    name: str,
    key: str,
    num_buckets: int,
) -> str:
    """Bucketed external table: hash-partition rows into ``num_buckets``
    files by ``key`` and sort within each bucket. Two tables bucketed the
    same way join WITHOUT a shuffle (Spark plans a sort-merge join over
    co-located buckets — verified by the plan test) — at 100 TB this is
    how recurring fact-fact joins (J3: lineitem ⋈ orders) drop their
    dominant exchange: pay one bucketed write, join shuffle-free forever
    after. The reference gets the same effect from BigQuery clustered
    tables (core/BigQueryManager.py:47-70 load path).

    Returns the catalog table name to query (``spark.table(returned)``).
    The name is namespaced with a digest of ``base_dir`` so two directories
    using the same logical table name never collide in the shared session
    catalog, and any stale registration under that name is dropped before
    the save so the catalog entry always matches the written path.
    """
    path = table_path(base_dir, name)
    catalog_name = f"{name}_{hashlib.md5(base_dir.encode()).hexdigest()[:8]}"
    spark.sql(f"DROP TABLE IF EXISTS `{catalog_name}`")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(catalog_name)
    )
    return catalog_name


def prepare_and_load(
    spark: SparkSession,
    df: DataFrame,
    base_dir: str,
    name: str,
    write_mode: str = "append",
    load_data: bool = True,
) -> str:
    """K6: ensure table → optional load with disposition
    (extractor_bq_helpers.py:13-38). Schema comes from the DataFrame
    itself — Spark schemas are explicit, replacing the reference's
    first-row inference hazard (K3, core/BigQueryManager.py:72-114)."""
    path = ensure_table(spark, base_dir, name, df)
    if not load_data:
        return path
    if write_mode == "overwrite":
        return overwrite(df, base_dir, name)
    return append(df, base_dir, name)
