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


# transient transport trouble; 4xx (minus 429) are permanent
RETRYABLE_HTTP_STATUSES = frozenset({429, 500, 502, 503, 504})


def http_retry(
    do,
    max_retries: int = 3,
    backoff_s: float = 0.2,
    sleep=None,
    retry_statuses: frozenset = RETRYABLE_HTTP_STATUSES,
    what: str = "endpoint",
):
    """Bounded exponential backoff around a raw HTTP callable — the one
    retry state machine every HTTP transport here shares (LLM gateway,
    geocoders). ``do()`` returns the response bytes; HTTPErrors outside
    ``retry_statuses`` re-raise immediately (permanent), everything else
    retries up to ``max_retries`` with backoff_s·2^attempt sleeps."""
    import time as _time
    import urllib.error

    sleep = sleep if sleep is not None else _time.sleep
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            return do()
        except urllib.error.HTTPError as e:
            last = e
            if e.code not in retry_statuses:
                raise
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            last = e
        if attempt < max_retries - 1:
            sleep(backoff_s * (2 ** attempt))
    raise RuntimeError(
        f"{what} unreachable after {max_retries} tries"
    ) from last


class HttpGateway:
    """Production transport: an OpenAI-style ``/chat/completions`` HTTP
    client mirroring the reference's litellm call
    (core/LLMGateway.py:85-118: temperature-0.8 completion, JSON response
    format, content parsed as JSON, usage.total_tokens and the
    server-reported model extracted). Stdlib urllib only — the callable
    cloudpickles into Spark python workers like every gateway here.

    Behavior matched to the reference:

    * request body: model + single-user-message prompt + ``temperature``
      (default 0.8, the reference's constructor default) +
      ``response_format={"type": "json_object"}``.
    * response: ``choices[0].message.content`` must itself parse as JSON
      (core/LLMGateway.py:97-103 raises on JSONDecodeError) — a
      non-JSON completion raises, so a wrapping ``FallbackGateway``
      routes to its next link exactly like the reference's model chain.
    * return tuple: (content_json_text, usage.total_tokens,
      response.model) — the server-attributed model name, falling back
      to the requested one.

    On top (the part litellm did for the reference): bounded retry with
    exponential backoff on transport errors and retryable statuses
    (429/5xx), non-retryable 4xx raise immediately. ``transport`` is
    injectable for tests (same pattern as the REST connector's
    ``_http_fetch``); the default is a stdlib urlopen POST. Chain two of
    these inside ``FallbackGateway`` for the reference's full
    gpt-4o-mini → gemini-2.5-flash cascade.
    """

    def __init__(
        self,
        base_url: str,
        model: str = "gpt-4o-mini",
        api_key: str = "",
        temperature: float = 0.8,
        max_retries: int = 3,
        backoff_s: float = 0.2,
        transport=None,
        sleep=None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.temperature = temperature
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.transport = transport
        self.sleep = sleep

    _RETRY_STATUSES = RETRYABLE_HTTP_STATUSES

    def _post(self, body: bytes) -> bytes:
        if self.transport is not None:
            return self.transport(body)
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/chat/completions",
            data=body,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.read()

    def __call__(self, prompt: str) -> tuple[str, int, str]:
        body = json.dumps(
            {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": self.temperature,
                "response_format": {"type": "json_object"},
            }
        ).encode("utf-8")
        raw = http_retry(
            lambda: self._post(body),
            max_retries=self.max_retries,
            backoff_s=self.backoff_s,
            sleep=self.sleep,
            retry_statuses=self._RETRY_STATUSES,
            what="LLM endpoint",
        )
        resp = json.loads(raw.decode("utf-8"))
        content = resp["choices"][0]["message"]["content"]
        json.loads(content)  # reference contract: content must be JSON
        usage = resp.get("usage") or {}
        tokens = int(usage.get("total_tokens", 0))
        model = resp.get("model") or self.model
        return content, tokens, model


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
