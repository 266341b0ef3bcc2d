"""Explicit table schemas (K3) — the reference infers schemas from the
FIRST ROW of each pandas frame (core/BigQueryManager.py:72-114, sampling
hazard noted in SURVEY §1.2); here every domain table has a declared
StructType so ingest is deterministic and nulls/empties can't flip types.

Column lists come from the reference's MERGE update sets and flattening
code — the closest it has to DDL (SURVEY §1.3; FIXTURES.md §A):
tickets   core/extract/helpers/extractor_bq_helpers.py:61-67
messages  core/Ticket.py:149-183, enrichment TicketMessageProcessor.py:207-292
users     extractor_bq_helpers.py:69-72
agents    core/TicketMessageProcessor.py:48-58
tags      extraction_helpers.py:242-245
convo     extractor_bq_helpers.py:75-81, core/schemas/ConvoResponse.py:3-19
logs      core/extract/ExtractionLogger.py:134-176
gazetteer core/Geocode.py:26-34
serviceable config/mgo_serviceable.csv:1

Timestamps are TIMESTAMP_NTZ: the reference stores tz-naive Manila wall
clock (utils/date_utils.py:4-12); NTZ + explicit conversion expressions
keep results machine-independent (SURVEY §7 hard part (f)).
"""
from __future__ import annotations

from pyspark.sql import types as T


def _ddl(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


TICKETS_DDL = """
    id STRING, owner_contactid STRING, owner_email STRING, owner_name STRING,
    departmentid STRING, agentid STRING, status STRING, tags STRING,
    code STRING, channel_type STRING,
    date_created TIMESTAMP_NTZ, date_changed TIMESTAMP_NTZ,
    date_resolved TIMESTAMP_NTZ, last_activity TIMESTAMP_NTZ,
    last_activity_public TIMESTAMP_NTZ, public_access_urlcode STRING,
    subject STRING, custom_fields STRING,
    date_due TIMESTAMP_NTZ, date_deleted TIMESTAMP_NTZ,
    datetime_extracted TIMESTAMP_NTZ
"""

MESSAGES_DDL = """
    ticket_id STRING, owner_name STRING, agentid STRING, agent_name STRING,
    id STRING, parent_id STRING, userid STRING, user_full_name STRING,
    type STRING, status STRING,
    datecreated TIMESTAMP_NTZ, datefinished TIMESTAMP_NTZ,
    sort_order BIGINT, mail_msg_id STRING, pop3_msg_id STRING,
    message_id STRING, message_userid STRING, message_type STRING,
    message_datecreated TIMESTAMP_NTZ, message_format STRING,
    message STRING, message_visibility STRING,
    sender_name STRING, sender_type STRING,
    receiver_name STRING, receiver_type STRING, reference_code STRING
"""

USERS_DDL = "id STRING, name STRING, email STRING, role STRING, avatar_url STRING"

AGENTS_DDL = "id STRING, name STRING, email STRING, last_pswd_change TIMESTAMP_NTZ"

TAGS_DDL = "id STRING, name STRING, color STRING"

CONVO_ANALYSIS_DDL = """
    ticket_id STRING, service_category STRING, summary STRING,
    intent_rating STRING, engagement_rating BIGINT, clarity_rating BIGINT,
    resolution_rating BIGINT, sentiment_rating STRING, location STRING,
    schedule_date TIMESTAMP_NTZ, schedule_time STRING,
    car STRING, contact_num STRING, payment STRING,
    inspection STRING, quotation STRING,
    tokens BIGINT, model STRING, date_extracted TIMESTAMP_NTZ,
    address STRING, viable STRING, latitude DOUBLE, longitude DOUBLE,
    source STRING
"""

LOGS_DDL = """
    extraction_date TIMESTAMP_NTZ, extraction_run_time DOUBLE,
    no_tickets_new BIGINT, no_tickets_update BIGINT, no_tickets_total BIGINT,
    no_messages_new BIGINT, no_messages_old BIGINT, no_messages_total BIGINT,
    total_tokens BIGINT, model STRING, log_message STRING
"""

GAZETTEER_DDL = """
    address STRING, geo_level STRING, municity_code STRING,
    provdist_code STRING, latitude DOUBLE, longitude DOUBLE
"""

SERVICEABLE_DDL = """
    municipality_id BIGINT, province_id BIGINT, municipality_name STRING,
    is_serviceable BIGINT, created_at STRING, updated_at STRING,
    nearest_hub_id STRING, hub_name STRING
"""


def tickets_schema() -> T.StructType:
    return _ddl(TICKETS_DDL)


def messages_schema() -> T.StructType:
    return _ddl(MESSAGES_DDL)


def users_schema() -> T.StructType:
    return _ddl(USERS_DDL)


def agents_schema() -> T.StructType:
    return _ddl(AGENTS_DDL)


def tags_schema() -> T.StructType:
    return _ddl(TAGS_DDL)


def convo_analysis_schema() -> T.StructType:
    return _ddl(CONVO_ANALYSIS_DDL)


def logs_schema() -> T.StructType:
    return _ddl(LOGS_DDL)


def gazetteer_schema() -> T.StructType:
    return _ddl(GAZETTEER_DDL)


def serviceable_schema() -> T.StructType:
    return _ddl(SERVICEABLE_DDL)
