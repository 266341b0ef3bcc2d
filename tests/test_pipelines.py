"""Golden end-to-end route-pipeline tests on domain-shaped fixtures —
SURVEY §5.2: synthetic payloads → full pipeline → table assertions with
the REST and LLM boundaries stubbed."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.enrich.gateway import StubGateway
from mgo_liveagent_data_pipeline_spark.pipelines import (
    read_table,
    run_agents_pipeline,
    run_convo_pipeline,
    run_logs_pipeline,
    run_message_pipeline,
    run_ticket_pipeline,
)
from mgo_liveagent_data_pipeline_spark.transforms.messages import (
    SPECIAL_USER_ID,
    SYSTEM_USER_ID,
)

def NOW():
    return F.lit(dt.datetime(2024, 2, 1, 12, 0, 0)).cast("timestamp")


@pytest.fixture()
def agents(spark):
    return spark.createDataFrame(
        [
            ("a1", "Alice Agent", "alice@x.ph", None),
            (SPECIAL_USER_ID, "Raw Special Name", "mgo@x.ph", None),
        ],
        "id string, name string, email string, last_pswd_change timestamp",
    )


@pytest.fixture()
def raw_messages(spark):
    rows = [
        # (ticket, owner, ticket_agent, msg id, userid, type, fmt, created, text)
        ("t1", "Owen Owner", "a1", "m1", "u9", "M", "T",
         dt.datetime(2024, 1, 1, 10, 0), "hi I need help Ref: XY12"),
        ("t1", "Owen Owner", "a1", "m2", "a1", "M", "T",
         dt.datetime(2024, 1, 1, 10, 5), "on it"),
        ("t1", "Owen Owner", "a1", "m3", SYSTEM_USER_ID, "M", "H",
         dt.datetime(2024, 1, 1, 10, 6), "<b>auto</b>"),
        ("t2", "Pia Person", SPECIAL_USER_ID, "m4", SPECIAL_USER_ID, "M", "T",
         dt.datetime(2024, 1, 2, 9, 0), "booking confirmed"),
        ("t2", "Pia Person", SPECIAL_USER_ID, "m5", "u7", "M", "T",
         dt.datetime(2024, 1, 2, 9, 30), "thanks"),
    ]
    return spark.createDataFrame(
        rows,
        [
            "ticket_id", "owner_name", "agentid", "message_id", "userid",
            "message_type", "message_format", "message_datecreated", "message",
        ],
    )


def test_message_pipeline_sender_receiver_rules(spark, tmp_path, agents, raw_messages):
    run_message_pipeline(spark, raw_messages, agents, str(tmp_path), now=NOW())
    out = {r["message_id"]: r for r in read_table(spark, str(tmp_path), "messages").collect()}

    # rule 3: agent-sent
    assert out["m2"]["sender_name"] == "Alice Agent"
    assert out["m2"]["sender_type"] == "agent"
    assert out["m2"]["receiver_name"] == "Owen Owner"
    # rule 1: system id
    assert out["m3"]["sender_name"] == "System"
    assert out["m3"]["sender_type"] == "system"
    # rule 2: special id
    assert out["m4"]["sender_name"] == "MechaniGo.ph"
    # rule 4: client-sent, known ticket agent
    assert out["m1"]["sender_name"] == "Owen Owner"
    assert out["m1"]["sender_type"] == "client"
    assert out["m1"]["receiver_name"] == "Alice Agent"
    assert out["m1"]["receiver_type"] == "agent"
    # rule 4 + special-id ticket agent override
    assert out["m5"]["receiver_name"] == "MechaniGo.ph"
    # F1 regex
    assert out["m1"]["reference_code"] == "XY12"
    assert out["m2"]["reference_code"] == "No Reference code"
    # F7: Manila = UTC+8
    assert out["m1"]["message_datecreated"] == dt.datetime(2024, 1, 1, 18, 0)


def test_ticket_pipeline_upsert_and_hygiene(spark, tmp_path, agents):
    base = str(tmp_path)
    t1 = spark.createDataFrame(
        [("t1", "open", ["vip", "car"], dt.datetime(2024, 1, 1, 0, 0))],
        ["id", "status", "tags", "date_created"],
    )
    run_ticket_pipeline(spark, t1, base, now=NOW())
    got = read_table(spark, base, "tickets").collect()[0]
    assert got["tags"] == "vip,car"
    assert got["date_created"] == dt.datetime(2024, 1, 1, 8, 0)  # Manila
    assert got["datetime_extracted"] == dt.datetime(2024, 2, 1, 20, 0)

    # re-extraction updates in place (MERGE semantics)
    t1b = spark.createDataFrame(
        [("t1", "closed", ["vip"], dt.datetime(2024, 1, 1, 0, 0))],
        ["id", "status", "tags", "date_created"],
    )
    run_ticket_pipeline(spark, t1b, base, now=NOW())
    rows = read_table(spark, base, "tickets").collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "closed"


def test_agents_pipeline_truncates(spark, tmp_path, agents):
    base = str(tmp_path)
    run_agents_pipeline(spark, agents, base)
    run_agents_pipeline(spark, agents, base)
    assert read_table(spark, base, "agents").count() == agents.count()


def test_convo_pipeline_history_and_upsert(spark, tmp_path, agents, raw_messages):
    base = str(tmp_path)
    run_message_pipeline(spark, raw_messages, agents, base, now=NOW())
    messages = read_table(spark, base, "messages")
    run_convo_pipeline(spark, messages, StubGateway(), base)
    cur = read_table(spark, base, "convo_analysis")
    assert cur.count() == 2  # t1, t2 (HTML-only rows filtered by P4)
    row = {r["ticket_id"]: r for r in cur.collect()}["t1"]
    assert row["model"] == "stub-v1"
    assert row["schedule_ts"] is not None
    # second run: history accumulates, current stays deduped
    run_convo_pipeline(spark, messages, StubGateway(), base)
    assert read_table(spark, base, "convo_analysis").count() == 2
    assert read_table(spark, base, "convo_analysis_history").count() == 4


def test_logs_pipeline_metrics_row(spark, tmp_path, agents, raw_messages):
    base = str(tmp_path)
    run_message_pipeline(spark, raw_messages, agents, base, now=NOW())
    messages = read_table(spark, base, "messages")
    run_convo_pipeline(spark, messages, StubGateway(), base)
    analyzed = read_table(spark, base, "convo_analysis")
    run_keys = messages.select("ticket_id").distinct()
    existing = spark.createDataFrame([("t1",)], ["ticket_id"])
    run_logs_pipeline(spark, run_keys, existing, "ticket_id", analyzed, base)
    log = read_table(spark, base, "logs").collect()[0]
    assert log["no_new"] == 1 and log["no_existing"] == 1 and log["no_total"] == 2
    assert log["total_tokens"] > 0
    assert log["model"] == "stub-v1"
