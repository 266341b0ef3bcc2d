"""U1 — per-conversation LLM analysis, the reference's flagship operator
(core/extract/ConvoDataExtract.py:37-72,109-187 create/analyze_convo;
driver fan-out extraction_helpers.py:123-162,218-226).

Reference shape: per ticket — assemble the conversation in message order
(A5), fill the prompt template, call the LLM with a fallback chain, parse
the JSON, whitelist to the expected fields with null defaults, and emit an
error-fallback row if anything fails.

Spark shape: the conversation assembly (A5) runs in Catalyst — ordered
group-concat via ``array_sort(collect_list(struct))`` — so only one
narrow row per conversation crosses into Python, where a single
``mapInPandas`` stage batches thousands of conversations per Arrow batch
(a per-group ``applyInPandas`` pays the Arrow round trip once per
conversation; measured ~3× slower at sf0.1). Output typed by an explicit
StructType (the pydantic ResponseSchema's equivalent). The reference's
Semaphore(10) concurrency cap becomes the task-level parallelism of the
stage; at 100 TB you bound external-API pressure by coalescing to N
partitions before this stage, not with driver-side semaphores.

Retry safety: the gateway is injected and the stage is a pure function of
its input batch — a re-executed Spark task recomputes identical output
(hash-deterministic stub) or re-calls an idempotent endpoint.
"""
from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .gateway import EXPECTED_FIELDS, PROMPT_TEMPLATE

_RATING_FIELDS = {
    "intent_rating",
    "engagement_rating",
    "clarity_rating",
    "resolution_rating",
    "sentiment_rating",
}


def response_schema(key_col: str, key_type: T.DataType) -> T.StructType:
    """The typed output contract — ResponseSchema (core/schemas/
    ConvoResponse.py:3-19) plus run metadata (tokens/model/date_extracted,
    extraction_helpers.py:148-162)."""
    fields = [T.StructField(key_col, key_type)]
    for f in EXPECTED_FIELDS:
        dtype = T.LongType() if f in _RATING_FIELDS else T.StringType()
        fields.append(T.StructField(f, dtype))
    fields += [
        T.StructField("tokens", T.LongType()),
        T.StructField("model", T.StringType()),
        T.StructField("date_extracted", T.TimestampType()),
    ]
    return T.StructType(fields)


def analyze_conversations(
    df: DataFrame,
    gateway: Callable[[str], tuple[str, int, str]],
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    text_col: str = "event_type",
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One output row per conversation group.

    Conversation line format is ``<text>#<id>`` joined by `` | `` in
    (order_cols) order — deterministic at any parallelism because the sort
    happens inside the aggregation result (array_sort of the collected
    structs), never on input row order. The Python boundary sees one
    pre-assembled narrow row per conversation.
    """
    from pyspark.sql import functions as F

    key_type = df.schema[key_col].dataType
    schema = response_schema(key_col, key_type)
    out_cols = [f.name for f in schema.fields]

    line = F.concat(
        F.col(text_col).cast("string"), F.lit("#"), F.col(id_col).cast("string")
    )
    sort_struct = F.struct(
        *[F.col(c) for c in order_cols], line.alias("__line")
    )
    grouped = df.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(sort_struct)), lambda s: s["__line"]
            ),
            " | ",
        ).alias("__convo"),
        F.max(ts_col).alias("__max_ts"),
    )

    def _analyze(batches):
        for pdf in batches:
            recs = []
            for keyv, convo, max_ts in zip(
                pdf[key_col], pdf["__convo"], pdf["__max_ts"]
            ):
                prompt = PROMPT_TEMPLATE.format(conversation=convo)
                try:
                    raw, tokens, model = gateway(prompt)
                    data = json.loads(raw)
                    if not isinstance(data, dict):
                        raise ValueError("non-object completion")
                    # field whitelist + null defaults
                    # (ConvoDataExtract.py:132-155)
                    rec = {k: data.get(k) for k in EXPECTED_FIELDS}
                    # pydantic-style coercion: ratings must land as ints
                    # or the Arrow cast at yield kills the task instead
                    # of producing the fallback row
                    for k in _RATING_FIELDS:
                        v = rec.get(k)
                        if v is not None:
                            iv = int(v)  # ValueError → fallback row
                            if isinstance(v, float) and iv != v:
                                raise ValueError(f"non-integral {k}: {v}")
                            rec[k] = iv
                except Exception:
                    # error-fallback row (ConvoDataExtract.py:163-187)
                    rec = {k: None for k in EXPECTED_FIELDS}
                    rec["summary"] = "ANALYSIS_FAILED"
                    tokens, model = 0, getattr(gateway, "model", "unknown")
                rec[key_col] = keyv
                rec["tokens"] = tokens
                rec["model"] = model
                rec["date_extracted"] = max_ts
                recs.append(rec)
            yield pd.DataFrame(recs, columns=out_cols)

    return grouped.mapInPandas(_analyze, schema)
