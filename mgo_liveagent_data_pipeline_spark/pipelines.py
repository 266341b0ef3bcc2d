"""End-to-end route pipelines — the reference's FastAPI entry points
(SURVEY §3) assembled from transforms + enrich + sinks. A user of the
reference maps each route onto one function here:

POST /extract/process-tickets-and-messages → run_ticket_pipeline +
    run_message_pipeline (Extractor.py:56-176)
POST /extract/process-convo → run_convo_pipeline (Extractor.py:254-327)
POST /extract/process-agents → run_agents_pipeline (Extractor.py:212)
POST /process-logs → run_logs_pipeline (ExtractionLogger.py:95-176)

Each stage is lazy until its sink write; incremental semantics come from
the staged-MERGE upsert (K4) exactly like the reference's BigQuery MERGE.
"""
from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .enrich.convo import analyze_conversations
from .functions.datetimes import fuse_schedule
from .operators.setops import new_vs_existing_counts
from .sinks.writers import append, history_append, overwrite, table_path, upsert
from .transforms.messages import process_messages
from .transforms.tickets import process_agents, process_tags, process_tickets


def run_ticket_pipeline(
    spark: SparkSession,
    raw_tickets: DataFrame,
    base_dir: str,
    now: Column | None = None,
) -> str:
    """Transform + idempotent MERGE upsert keyed on id (Extractor.py:56-100)."""
    df = process_tickets(raw_tickets, now)
    return upsert(spark, df, base_dir, "tickets", "id")


def run_message_pipeline(
    spark: SparkSession,
    raw_messages: DataFrame,
    agents: DataFrame,
    base_dir: str,
    now: Column | None = None,
) -> str:
    """Enrich (sender/receiver, reference_code) + append-only load
    (Extractor.py:102-176; messages are append-only, Extractor.py:162)."""
    df = process_messages(raw_messages, agents, now=now)
    return append(df, base_dir, "messages")


def run_agents_pipeline(
    spark: SparkSession, raw_agents: DataFrame, base_dir: str
) -> str:
    """Dimension refresh: WRITE_TRUNCATE (Extractor.py:212)."""
    return overwrite(process_agents(raw_agents), base_dir, "agents")


def run_tags_pipeline(
    spark: SparkSession, raw_tags: DataFrame, base_dir: str
) -> str:
    """Tags dimension refresh: NaN-fill + WRITE_TRUNCATE
    (Extractor.py:239, extraction_helpers.py:242-245)."""
    return overwrite(process_tags(raw_tags), base_dir, "tags")


def run_convo_pipeline(
    spark: SparkSession,
    messages: DataFrame,
    gateway: Callable[[str], tuple[str, int, str]],
    base_dir: str,
) -> str:
    """LLM conversation analysis: P4 filter → A5+U1 applyInPandas →
    F11 schedule fusion → K5 history append → K4 upsert
    (Extractor.py:254-327)."""
    convo_msgs = messages.where(
        (F.col("message_type") == "M") & (F.col("message_format") == "T")
    )
    analyzed = analyze_conversations(
        convo_msgs,
        gateway,
        key_col="ticket_id",
        order_cols=("message_datecreated", "message_id"),
        text_col="message",
        id_col="message_id",
        ts_col="message_datecreated",
    ).withColumn(
        "schedule_ts",
        fuse_schedule(F.col("schedule_date"), F.col("schedule_time")),
    )
    history_append(spark, analyzed, base_dir, "convo_analysis")
    return upsert(spark, analyzed, base_dir, "convo_analysis", "ticket_id")


def run_logs_pipeline(
    spark: SparkSession,
    run_keys: DataFrame,
    existing_keys: DataFrame,
    key: str,
    analyzed: DataFrame,
    base_dir: str,
) -> str:
    """Run metrics: E1/E2 new-vs-existing accounting + A1 token totals →
    one-row append to logs (ExtractionLogger.py:95-176)."""
    counts = new_vs_existing_counts(run_keys, existing_keys, key)
    tokens = analyzed.agg(
        F.sum("tokens").alias("total_tokens"),
        F.max("model").alias("model"),
    )
    row = counts.crossJoin(tokens).select(
        F.date_trunc("second", F.current_timestamp()).alias("extraction_date"),
        F.col("n_new").alias("no_new"),
        F.col("n_existing").alias("no_existing"),
        F.col("n_total").alias("no_total"),
        "total_tokens",
        "model",
    )
    return append(row, base_dir, "logs")


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(base_dir, name))
