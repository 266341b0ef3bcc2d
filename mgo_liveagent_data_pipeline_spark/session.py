"""SparkSession factory.

Reference counterpart: ``config/bq_config.py`` + ``core/BigQueryManager.py``
construct a BigQuery client per run; here the "engine handle" is a
SparkSession configured for columnar scale work:

* AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion) — this is what makes the same plan survive a
  100×-1000× scale-up without re-tuning.
* Arrow on — every Pandas-UDF boundary is vectorized batch transfer.
* ``spark.sql.session.timeZone=UTC`` — source timestamps are stored as
  instants; wall-clock conversion to Asia/Manila is an explicit expression
  (see functions.datetime.to_manila), never an ambient session setting.
  The reference pinned Manila globally (``config/config.py:25``); pinning
  UTC + explicit conversion keeps results machine-independent.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession

MANILA_TZ = "Asia/Manila"

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mgo_liveagent_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    ``shuffle_partitions`` defaults to the local core count; on a real
    cluster set it to ~2-3× total executor cores (or leave AQE's coalescing
    to shrink an over-provisioned 2000 down to what the data needs).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # 128 MB input splits: right-sized tasks at any SF.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
