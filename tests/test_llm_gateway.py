"""HttpGateway: the production LLM transport over a loopback OpenAI-shaped
endpoint — request shape, retry/backoff, JSON-content contract, fallback
chaining, and the end-to-end Spark enrichment path over real HTTP."""
from __future__ import annotations

import json
import threading

import pytest


@pytest.fixture()
def llm_api():
    """Loopback /chat/completions endpoint. ``behavior`` mutates per test:
    a list of response plans consumed per request — each is ("ok", payload),
    ("status", code), or ("raw", body_dict). When drained, repeats the last.
    Every request body is recorded in ``seen``."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen: list[dict] = []
    plans: list = []

    default_content = {
        "service_category": "repair",
        "summary": "s",
        "intent_rating": 3,
        "engagement_rating": 3,
        "clarity_rating": 3,
        "resolution_rating": 3,
        "sentiment_rating": 3,
        "location": "manila",
        "schedule_date": "2024-01-15",
        "schedule_time": "3PM",
        "car": "car-x",
        "inspection": "Yes",
        "quotation": "No",
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n).decode())
            seen.append({"path": self.path, "body": req,
                         "auth": self.headers.get("Authorization")})
            plan = plans.pop(0) if len(plans) > 1 else (
                plans[0] if plans else ("ok", default_content)
            )
            kind, arg = plan
            if kind == "status":
                self.send_response(arg)
                self.end_headers()
                return
            if kind == "raw":
                body = json.dumps(arg).encode()
            else:
                body = json.dumps(
                    {
                        "model": f"{req['model']}-2024-07-18",
                        "choices": [
                            {"message": {"content": json.dumps(arg)}}
                        ],
                        "usage": {"total_tokens": 42, "prompt_tokens": 30,
                                  "completion_tokens": 12},
                    }
                ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", seen, plans, default_content
    finally:
        srv.shutdown()


def test_http_gateway_request_shape_and_attribution(llm_api):
    from mgo_liveagent_data_pipeline_spark.enrich.gateway import HttpGateway

    base, seen, plans, content = llm_api
    gw = HttpGateway(base, model="gpt-4o-mini", api_key="sk-test")
    text, tokens, model = gw("Analyze conversation JSON: hello")
    assert json.loads(text)["service_category"] == "repair"
    assert tokens == 42
    assert model == "gpt-4o-mini-2024-07-18"  # server-attributed, not requested
    body = seen[-1]["body"]
    assert seen[-1]["path"] == "/chat/completions"
    assert seen[-1]["auth"] == "Bearer sk-test"
    assert body["temperature"] == 0.8  # the reference's default
    assert body["messages"] == [
        {"role": "user", "content": "Analyze conversation JSON: hello"}
    ]
    assert body["response_format"] == {"type": "json_object"}


def test_http_gateway_retries_5xx_then_succeeds(llm_api):
    from mgo_liveagent_data_pipeline_spark.enrich.gateway import HttpGateway

    base, seen, plans, content = llm_api
    plans.extend([("status", 503), ("status", 429), ("ok", content)])
    naps: list[float] = []
    gw = HttpGateway(base, sleep=naps.append)
    text, tokens, model = gw("p")
    assert json.loads(text)["location"] == "manila"
    assert len(seen) == 3
    assert naps == [0.2, 0.4]  # exponential backoff between tries


def test_http_gateway_permanent_4xx_raises_immediately(llm_api):
    import urllib.error

    from mgo_liveagent_data_pipeline_spark.enrich.gateway import HttpGateway

    base, seen, plans, content = llm_api
    plans.append(("status", 400))
    gw = HttpGateway(base, sleep=lambda s: None)
    with pytest.raises(urllib.error.HTTPError):
        gw("p")
    assert len(seen) == 1  # no retry on a permanent client error


def test_http_gateway_rejects_non_json_content(llm_api):
    from mgo_liveagent_data_pipeline_spark.enrich.gateway import HttpGateway

    base, seen, plans, content = llm_api
    plans.append(
        ("raw", {"model": "m", "choices": [{"message": {"content": "not json"}}]})
    )
    gw = HttpGateway(base)
    with pytest.raises(json.JSONDecodeError):
        gw("p")  # core/LLMGateway.py:97-103: non-JSON completion raises


def test_http_gateway_exhausted_retries_raise_runtime_error():
    from mgo_liveagent_data_pipeline_spark.enrich.gateway import HttpGateway

    # unroutable port: every attempt is a transport error
    gw = HttpGateway("http://127.0.0.1:1", max_retries=2, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="unreachable after 2"):
        gw("p")


def test_fallback_chain_over_http(llm_api):
    """The reference's model cascade with real transports: a dead primary
    endpoint falls back to the live secondary, whose attribution wins."""
    from mgo_liveagent_data_pipeline_spark.enrich.gateway import (
        FallbackGateway,
        HttpGateway,
    )

    base, seen, plans, content = llm_api
    dead = HttpGateway("http://127.0.0.1:1", model="gpt-4o-mini",
                       max_retries=1, sleep=lambda s: None)
    live = HttpGateway(base, model="gemini-2.5-flash")
    text, tokens, model = FallbackGateway(dead, live)("p")
    assert model == "gemini-2.5-flash-2024-07-18"
    assert seen[-1]["body"]["model"] == "gemini-2.5-flash"


def test_analyze_conversations_over_http(spark, llm_api):
    """End to end: the U1 enrichment stage with the HTTP gateway — the
    mapInPandas workers POST to the loopback endpoint from their python
    processes (HttpGateway must cloudpickle) and the typed whitelist row
    comes back."""
    from mgo_liveagent_data_pipeline_spark.enrich.convo import (
        analyze_conversations,
    )
    from mgo_liveagent_data_pipeline_spark.enrich.gateway import HttpGateway
    from mgo_liveagent_data_pipeline_spark.session import ship_package
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table

    base, seen, plans, content = llm_api
    ship_package(spark)
    events = load_table(spark, "/root/testdata/sf0.001", "events").where(
        "user_id < 5"
    )
    out = analyze_conversations(events, HttpGateway(base), key_col="user_id")
    rows = out.collect()
    assert rows and all(r["model"] == "gpt-4o-mini-2024-07-18" for r in rows)
    assert all(r["service_category"] == "repair" for r in rows)
    assert all(r["intent_rating"] == 3 for r in rows)
    assert all(r["tokens"] == 42 for r in rows)
    assert len(seen) >= len(rows)  # one completion per conversation
