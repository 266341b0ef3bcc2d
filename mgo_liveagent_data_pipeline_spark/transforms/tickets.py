"""Ticket/agent transforms (reference process_tickets / process_agents,
core/extract/helpers/extraction_helpers.py:31-78; row defaults
core/Ticket.py:57-63).

Each is a pure DataFrame → DataFrame function: the reference's eager
per-column pandas mutations become one lazy projection that Catalyst fuses
into the scan."""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.datetimes import to_manila

TICKET_DATE_COLS = (
    "date_created",
    "date_changed",
    "last_activity",
    "last_activity_public",
    "date_due",
    "date_deleted",
    "date_resolved",
    "datetime_extracted",
)

MESSAGE_DATE_COLS = (
    "datecreated",
    "datefinished",
    "message_datecreated",
    "datetime_extracted",
)


def add_extraction_timestamp(
    df: DataFrame, now: Column | None = None
) -> DataFrame:
    """P8: stamp datetime_extracted (second precision, like the
    reference's strftime round trip, extraction_helpers.py:19-22).
    ``now`` is injectable for deterministic tests/oracles."""
    ts = now if now is not None else F.date_trunc("second", F.current_timestamp())
    return df.withColumn("datetime_extracted", ts)


def normalize_timezones(
    df: DataFrame, cols: tuple[str, ...], parse_strings: bool = True
) -> DataFrame:
    """F7 batch: UTC instants → Manila wall clock for every present column
    (set_timezone, utils/date_utils.py:4-12). String columns are parsed
    with coerce-to-null first."""
    out = df
    for c in cols:
        if c not in out.columns:
            continue
        col = F.col(c)
        if parse_strings and isinstance(out.schema[c].dataType, T.StringType):
            col = F.try_to_timestamp(col)
        out = out.withColumn(c, to_manila(col))
    return out


def collapse_custom_fields(
    df: DataFrame, col: str = "custom_fields"
) -> DataFrame:
    """§1.2: a list-of-one-dict collapses to the dict, anything else to
    null (extraction_helpers.py:47-49)."""
    if col not in df.columns:
        return df
    if not isinstance(df.schema[col].dataType, T.ArrayType):
        return df
    return df.withColumn(
        col,
        F.when(F.size(F.col(col)) == 1, F.element_at(F.col(col), 1)),
    )


def join_tags_column(df: DataFrame, col: str = "tags") -> DataFrame:
    """F6: tags array → comma-joined string, null/empty → ''
    (core/Ticket.py:60)."""
    if col not in df.columns:
        return df
    if not isinstance(df.schema[col].dataType, T.ArrayType):
        return df
    return df.withColumn(
        col, F.coalesce(F.array_join(F.col(col), ","), F.lit(""))
    )


def process_tickets(df: DataFrame, now: Column | None = None) -> DataFrame:
    """The ticket route's transform block (extraction_helpers.py:31-50):
    extraction stamp → tz normalize → custom_fields collapse → tags join."""
    out = add_extraction_timestamp(df, now)
    out = normalize_timezones(out, TICKET_DATE_COLS)
    out = collapse_custom_fields(out)
    return join_tags_column(out)


def process_agents(df: DataFrame) -> DataFrame:
    """Agent dimension refresh transform (extraction_helpers.py:71-78)."""
    return normalize_timezones(df, ("last_pswd_change",))


def process_tags(df: DataFrame) -> DataFrame:
    """P6 on the raw tags payload: NaN-fill by dtype — strings → '',
    numerics → 0 (extraction_helpers.py:242-245); loaded WRITE_TRUNCATE
    like agents."""
    return df.na.fill("").na.fill(0)
