"""LLM gateway — the boundary the reference wraps around litellm
(core/LLMGateway.py:39-136: completion with temperature 0.8 and a
model-fallback chain gpt-4o-mini → gemini-2.5-flash).

The engine treats the gateway as an injected callable so the Spark stage is
a pure function of its input batch (side-effect-free task retries — SURVEY
§7 hard part (d)). Production would inject a real HTTP-calling gateway with
a token bucket; tests and the correctness gate inject ``StubGateway``:
hash-derived, deterministic, dependency-free, so the DuckDB oracle can
reproduce every field bit-for-bit.

Everything here is stdlib-only and must stay that way: the callable is
cloudpickled into Spark python workers.
"""
from __future__ import annotations

import hashlib
import json

PROMPT_TEMPLATE = "Analyze conversation JSON: {conversation}"

SERVICE_CATEGORIES = ["repair", "maintenance", "inspection", "quotation", "other"]
LOCATIONS = ["manila", "cebu", "davao", "quezon"]

# the 13 analysis fields the reference whitelists
# (core/extract/ConvoDataExtract.py:132-155, core/schemas/ConvoResponse.py)
EXPECTED_FIELDS = [
    "service_category",
    "summary",
    "intent_rating",
    "engagement_rating",
    "clarity_rating",
    "resolution_rating",
    "sentiment_rating",
    "location",
    "schedule_date",
    "schedule_time",
    "car",
    "inspection",
    "quotation",
]


class StubGateway:
    """Deterministic completion: every output field is a pure function of
    md5(prompt). Mirrors the real gateway's contract — returns
    (json_text, tokens_used, model_name) — including one extra JSON field
    (``debug``) that the whitelist must drop, like real LLM drift."""

    model = "stub-v1"

    def __call__(self, prompt: str) -> tuple[str, int, str]:
        hx = hashlib.md5(prompt.encode("utf-8")).hexdigest()
        d = [int(c, 16) for c in hx]
        convo = prompt[len(PROMPT_TEMPLATE) - len("{conversation}"):]
        payload = {
            "service_category": SERVICE_CATEGORIES[d[0] % 5],
            "summary": convo[:40],
            "intent_rating": d[1] % 5 + 1,
            "engagement_rating": d[2] % 5 + 1,
            "clarity_rating": d[3] % 5 + 1,
            "resolution_rating": d[4] % 5 + 1,
            "sentiment_rating": d[5] % 5 + 1,
            "location": LOCATIONS[d[6] % 4],
            "schedule_date": "2024-01-15",
            "schedule_time": "3PM" if d[7] % 2 == 0 else "11:30AM",
            "car": f"car-{hx[8]}",
            "inspection": "Yes" if d[9] % 2 == 0 else "No",
            "quotation": "Yes" if d[10] % 2 == 0 else "No",
            "debug": "not-in-schema",  # must be dropped by the whitelist
        }
        return json.dumps(payload), len(prompt) // 4, self.model


class FailingGateway:
    """Always raises — exercises the reference's error-fallback row path
    (core/extract/ConvoDataExtract.py:163-187) in tests."""

    model = "failing"

    def __call__(self, prompt: str) -> tuple[str, int, str]:
        raise RuntimeError("gateway unavailable")


class FallbackGateway:
    """Model-fallback chain — the reference tries its primary model and,
    on any exception, retries the completion against a secondary before
    giving up (core/LLMGateway.py:39-42,53-136: gpt-4o-mini →
    gemini-2.5-flash).

    The served model is whatever the answering gateway reports in its
    return tuple, so downstream rows record which link in the chain
    responded. Only both links failing propagates the exception — which
    the enrichment stage turns into its ANALYSIS_FAILED fallback row.

    Stateless and stdlib-only like every gateway here: cloudpickles into
    Spark python workers, and a re-executed task replays the same chain.
    """

    def __init__(self, primary, secondary) -> None:
        self.primary = primary
        self.secondary = secondary

    @property
    def model(self) -> str:
        # the model recorded on a both-failed fallback row: the last
        # link tried, mirroring the reference's final-error attribution
        return getattr(self.secondary, "model", "unknown")

    def __call__(self, prompt: str) -> tuple[str, int, str]:
        try:
            return self.primary(prompt)
        except Exception:
            return self.secondary(prompt)
