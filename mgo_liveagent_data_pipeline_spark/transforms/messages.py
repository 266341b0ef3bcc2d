"""Message enrichment transforms — the reference's sender/receiver
resolution and message processing (core/TicketMessageProcessor.py:207-292,
extraction_helpers.py:52-69) as broadcast joins + a when/otherwise chain.

The reference resolves via in-memory agent/user dict caches; here the
agents dimension is broadcast (bounded — it IS a cache that fits in one
process in the reference) and the rule cascade compiles to one codegen'd
projection. Rules, in order (_determine_sender_receiver):

1. userid == system id  → System / system → owner / client
2. userid == special id → MechaniGo.ph / system → owner / client
3. userid is a known agent → that agent / agent → owner / client
4. else the CLIENT sent it → owner / client → ticket's agent / agent,
   where the ticket agent resolves special-id → 'MechaniGo.ph',
   known → name, unknown/missing → 'Unknown Agent'.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.strings import extract_reference_code
from .tickets import MESSAGE_DATE_COLS, add_extraction_timestamp, normalize_timezones

# config/constants.py:8-9
SYSTEM_USER_ID = "system00"
SPECIAL_USER_ID = "00054iwg"

UNKNOWN_AGENT = "Unknown Agent"
UNKNOWN_USER = "Unknown User"


def resolve_sender_receiver(
    messages: DataFrame,
    agents: DataFrame,
    userid_col: str = "userid",
    ticket_agent_col: str = "agentid",
    owner_col: str = "owner_name",
    agent_id_col: str = "id",
    agent_name_col: str = "name",
) -> DataFrame:
    """Two broadcast lookups against the agents dim (sender-as-agent and
    ticket-agent), then the rule cascade. Adds sender_name/sender_type/
    receiver_name/receiver_type and agent_name."""
    sender_dim = F.broadcast(
        agents.select(
            F.col(agent_id_col).alias("__sa_id"),
            F.col(agent_name_col).alias("__sa_name"),
            F.lit(1).alias("__sa_hit"),
        )
    )
    ticket_dim = F.broadcast(
        agents.select(
            F.col(agent_id_col).alias("__ta_id"),
            F.col(agent_name_col).alias("__ta_name"),
            F.lit(1).alias("__ta_hit"),
        )
    )
    m = messages.join(
        sender_dim, F.col(userid_col) == F.col("__sa_id"), "left"
    ).join(ticket_dim, F.col(ticket_agent_col) == F.col("__ta_id"), "left")

    owner = F.coalesce(F.col(owner_col), F.lit(UNKNOWN_USER))
    # rule-4 ticket-agent resolution (incl. the special-id override that
    # only applies when the special id IS in the dimension)
    ticket_agent = (
        F.when(
            (F.col("__ta_hit") == 1) & (F.col("__ta_id") == SPECIAL_USER_ID),
            F.lit("MechaniGo.ph"),
        )
        .when(F.col("__ta_hit") == 1, F.coalesce(F.col("__ta_name"), F.lit(UNKNOWN_AGENT)))
        .otherwise(F.lit(UNKNOWN_AGENT))
    )
    is_system = F.col(userid_col) == SYSTEM_USER_ID
    is_special = F.col(userid_col) == SPECIAL_USER_ID
    is_agent = F.col("__sa_hit") == 1

    sender_name = (
        F.when(is_system, F.lit("System"))
        .when(is_special, F.lit("MechaniGo.ph"))
        .when(is_agent, F.coalesce(F.col("__sa_name"), F.lit(UNKNOWN_AGENT)))
        .otherwise(owner)
    )
    sender_type = (
        F.when(is_system | is_special, F.lit("system"))
        .when(is_agent, F.lit("agent"))
        .otherwise(F.lit("client"))
    )
    receiver_name = F.when(
        is_system | is_special | is_agent, owner
    ).otherwise(ticket_agent)
    receiver_type = F.when(
        is_system | is_special | is_agent, F.lit("client")
    ).otherwise(F.lit("agent"))
    # flat agent_name enrichment (process_messages_with_metadata:284-288)
    agent_name = F.when(
        F.col("__ta_hit") == 1, F.coalesce(F.col("__ta_name"), F.lit(UNKNOWN_AGENT))
    ).otherwise(F.lit(UNKNOWN_AGENT))

    return (
        m.withColumn("sender_name", sender_name)
        .withColumn("sender_type", sender_type)
        .withColumn("receiver_name", receiver_name)
        .withColumn("receiver_type", receiver_type)
        .withColumn("agent_name", agent_name)
        .drop("__sa_id", "__sa_name", "__sa_hit", "__ta_id", "__ta_name", "__ta_hit")
    )


def process_messages(
    messages: DataFrame,
    agents: DataFrame,
    message_col: str = "message",
    now: Column | None = None,
) -> DataFrame:
    """The message route's transform block (extraction_helpers.py:52-69 +
    enrichment): stamp → tz normalize → reference_code regex →
    sender/receiver resolution."""
    out = add_extraction_timestamp(messages, now)
    out = normalize_timezones(out, MESSAGE_DATE_COLS)
    out = out.withColumn(
        "reference_code", extract_reference_code(F.col(message_col))
    )
    return resolve_sender_receiver(out, agents)
