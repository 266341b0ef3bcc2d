"""REST connector tests against canned JSON pages (no network)."""
from __future__ import annotations

import json

import pytest

from mgo_liveagent_data_pipeline_spark.sources.rest import (
    HAS_DATASOURCE_API,
    LiveAgentDataSource,
    LiveAgentReader,
    TokenBucket,
    build_filter_expr,
    paginate,
    _fixture_fetch,
    fetch_correlated,
)

TICKETS = [
    [{"id": "t1", "status": "open", "owner_name": "ana"},
     {"id": "t2", "status": "closed", "owner_name": "bob"}],
    [{"id": "t3", "status": "open"}],  # owner_name missing → schema default
    [],  # empty page → stop
    [{"id": "t9", "status": "never-reached"}],
]

SCHEMA_DDL = "id string, status string, owner_name string"


@pytest.fixture()
def fixture_path(tmp_path):
    p = tmp_path / "pages.json"
    p.write_text(
        json.dumps(
            {
                "tickets": TICKETS,
                "tickets/t1/messages": [[{"ticket_id": "t1", "message": "hi"},
                                         {"ticket_id": "t1", "message": "yo"}]],
                "tickets/t2/messages": [[{"ticket_id": "t2", "message": "ok"}]],
                "tickets/t3/messages": [[]],
            }
        )
    )
    return str(p)


def test_token_bucket_math():
    clock = [0.0]
    slept = []

    def sleep(s):
        slept.append(s)
        clock[0] += s

    b = TokenBucket(60, capacity=1, clock=lambda: clock[0], sleep=sleep)
    b.acquire()  # burst token
    b.acquire()  # must wait ~1s at 1 token/sec
    assert pytest.approx(sum(slept), rel=1e-6) == 1.0


def test_build_filter_expr_matches_reference_shape():
    expr = build_filter_expr([("date_changed", "D>", "2024-01-01 00:00:00")])
    assert json.loads(expr) == [["date_changed", "D>", "2024-01-01 00:00:00"]]


def test_paginate_stops_on_empty_page(fixture_path):
    rows = list(
        paginate(
            lambda ep, params: _fixture_fetch(fixture_path, ep, params),
            "tickets",
            max_pages=10,
            per_page=5,
        )
    )
    assert [r["id"] for r in rows] == ["t1", "t2", "t3"]  # t9 never reached


def test_reader_pushdown_translation(spark):
    if not HAS_DATASOURCE_API:
        pytest.skip("no Python DataSource API")
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(SCHEMA_DDL)
    r = LiveAgentReader(schema, {"endpoint": "tickets"})
    rest = r.pushFilters([GreaterThan(("date_changed",), "2024-01-01"),
                          EqualTo(("status",), "open")])
    assert list(rest) == []
    assert ("date_changed", "D>", "2024-01-01") in r.pushed
    assert ("status", "=", "open") in r.pushed


def test_reader_partitions_cover_page_space(spark):
    from pyspark.sql.types import StructType

    r = LiveAgentReader(
        StructType.fromDDL(SCHEMA_DDL),
        {"max_pages": "10", "num_partitions": "3"},
    )
    parts = [p.value for p in r.partitions()]
    assert sum(n for _, n in parts) == 10
    starts = [s for s, _ in parts]
    assert starts == sorted(starts) and starts[0] == 1


def test_datasource_end_to_end(spark, fixture_path):
    if not HAS_DATASOURCE_API:
        pytest.skip("no Python DataSource API")
    spark.dataSource.register(LiveAgentDataSource)
    df = (
        spark.read.format("liveagent")
        .option("schema_ddl", SCHEMA_DDL)
        .option("endpoint", "tickets")
        .option("fixture_path", fixture_path)
        .option("max_pages", "10")
        .option("per_page", "5")
        .option("num_partitions", "2")
        .option("throttle", "false")
        .load()
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"t1", "t2", "t3"}
    assert rows["t3"]["owner_name"] is None  # P9 defaulting
    assert rows["t1"]["status"] == "open"


def test_fetch_correlated_flattens_children(spark, fixture_path):
    from pyspark.sql.types import StructType

    keys = spark.createDataFrame([("t1",), ("t2",), ("t3",)], ["id"])
    out = fetch_correlated(
        keys,
        StructType.fromDDL("ticket_id string, message string"),
        fixture_path,
    ).collect()
    got = sorted((r["ticket_id"], r["message"]) for r in out)
    assert got == [("t1", "hi"), ("t1", "yo"), ("t2", "ok")]


@pytest.fixture()
def http_api():
    """Loopback LiveAgent-shaped API: paginated tickets behind the ``data``
    envelope, equality ``_filters`` applied server-side, every request's
    headers+params recorded so tests can assert the transport contract."""
    import threading
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    all_rows = [
        {"id": "t1", "status": "open", "owner_name": "ana"},
        {"id": "t2", "status": "closed", "owner_name": "bob"},
        {"id": "t3", "status": "open", "owner_name": None},
    ]
    seen: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            params = dict(urllib.parse.parse_qsl(parsed.query))
            seen.append(
                {
                    "path": parsed.path,
                    "params": params,
                    "apikey": self.headers.get("apikey"),
                }
            )
            rows = all_rows
            for field, op, value in json.loads(params.get("_filters", "[]")):
                if op == "=":
                    rows = [r for r in rows if r.get(field) == value]
            page = int(params.get("_page", 1))
            per_page = int(params.get("_perPage", len(rows) or 1))
            body = json.dumps(
                {"data": rows[(page - 1) * per_page : page * per_page]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", seen
    finally:
        server.shutdown()
        thread.join()


def test_http_fetch_roundtrip(http_api):
    from mgo_liveagent_data_pipeline_spark.sources.rest import _http_fetch

    base_url, seen = http_api
    rows = _http_fetch(base_url, "sekrit", "tickets", {"_page": 1, "_perPage": 2})
    assert [r["id"] for r in rows] == ["t1", "t2"]  # data envelope unwrapped
    assert seen[-1]["apikey"] == "sekrit"
    assert seen[-1]["path"] == "/tickets"


def test_http_reader_paginates_and_propagates_filters(http_api):
    """Non-fixture mode: pushFilters-consumed predicates reach the server
    as the ``_filters`` param; pagination stops at the first empty page."""
    from pyspark.sql.types import StructType

    if not HAS_DATASOURCE_API:
        pytest.skip("no Python DataSource API")
    from pyspark.sql.datasource import EqualTo

    base_url, seen = http_api
    r = LiveAgentReader(
        StructType.fromDDL(SCHEMA_DDL),
        {
            "endpoint": "tickets",
            "base_url": base_url,
            "api_key": "sekrit",
            "max_pages": "10",
            "per_page": "2",
            "num_partitions": "1",
            "throttle": "false",
        },
    )
    rest = r.pushFilters([EqualTo(("status",), "open")])
    assert list(rest) == []  # consumed → evaluated API-side
    rows = list(r.read(r.partitions()[0]))
    assert [row[0] for row in rows] == ["t1", "t3"]  # server applied filter
    assert all(req["apikey"] == "sekrit" for req in seen)
    assert all(
        json.loads(req["params"]["_filters"]) == [["status", "=", "open"]]
        for req in seen
    )
    # 2 matching rows at per_page=2 → page 1 full, page 2 empty, stop there
    assert [req["params"]["_page"] for req in seen] == ["1", "2"]


def test_http_datasource_end_to_end(spark, http_api):
    """The full scan path over real HTTP: format("liveagent") with a
    base_url instead of canned fixtures."""
    if not HAS_DATASOURCE_API:
        pytest.skip("no Python DataSource API")
    base_url, seen = http_api
    spark.dataSource.register(LiveAgentDataSource)
    df = (
        spark.read.format("liveagent")
        .option("schema_ddl", SCHEMA_DDL)
        .option("endpoint", "tickets")
        .option("base_url", base_url)
        .option("api_key", "sekrit")
        .option("max_pages", "4")
        .option("per_page", "2")
        .option("num_partitions", "2")
        .option("throttle", "false")
        .load()
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"t1", "t2", "t3"}
    assert rows["t3"]["owner_name"] is None


def test_incremental_cursor_roundtrip(tmp_path):
    import json

    from mgo_liveagent_data_pipeline_spark.sources.rest import (
        IncrementalCursor,
        build_filter_expr,
    )

    cur = IncrementalCursor(str(tmp_path), "tickets")
    # first run: no watermark → full scan (no conditions)
    assert cur.filter_conditions() == []
    cur.advance("2024-01-10 06:00:00")
    # second run: API-side incremental predicate
    conds = cur.filter_conditions()
    assert conds == [("date_changed", "D>=", "2024-01-10 06:00:00")]
    assert json.loads(build_filter_expr(conds)) == [
        ["date_changed", "D>=", "2024-01-10 06:00:00"]
    ]
    # a replayed older batch cannot move the cursor backwards
    cur.advance("2024-01-09 00:00:00")
    assert cur.value() == "2024-01-10 06:00:00"
    cur.advance("2024-01-11 00:00:00")
    assert cur.value() == "2024-01-11 00:00:00"
    # a fresh handle reads the persisted state
    assert IncrementalCursor(str(tmp_path), "tickets").value() == "2024-01-11 00:00:00"


def test_incremental_extraction_end_to_end(tmp_path):
    """Run-to-run incremental flow over real HTTP: run 1 full-scans and
    advances the cursor; run 2 sends the cursor's D>= predicate as
    _filters (evaluated API-side) and fetches only newer rows; a replayed
    old batch cannot move the cursor backwards."""
    import threading
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from mgo_liveagent_data_pipeline_spark.sources.rest import (
        IncrementalCursor,
        build_filter_expr,
        paginate,
        _http_fetch,
    )

    rows = [
        {"id": "t1", "date_changed": "2024-01-09 08:00:00"},
        {"id": "t2", "date_changed": "2024-01-10 06:00:00"},
    ]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            params = dict(urllib.parse.parse_qsl(parsed.query))
            out = rows
            for field, op, value in json.loads(params.get("_filters", "[]")):
                if op == "D>=":
                    out = [r for r in out if r.get(field) >= value]
            page = int(params.get("_page", 1))
            per = int(params.get("_perPage", len(out) or 1))
            body = json.dumps(
                {"data": out[(page - 1) * per : page * per]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base_url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        cur = IncrementalCursor(str(tmp_path), "tickets")

        def run():
            params = {}
            conds = cur.filter_conditions()
            if conds:
                params["_filters"] = build_filter_expr(conds)
            fetched = list(
                paginate(
                    lambda ep, p: _http_fetch(base_url, "k", ep, p),
                    "tickets",
                    params,
                    max_pages=5,
                    per_page=10,
                )
            )
            if fetched:  # advance only after the (simulated) sink commit
                cur.advance(max(r["date_changed"] for r in fetched))
            return [r["id"] for r in fetched]

        assert run() == ["t1", "t2"]  # first run: full scan
        assert cur.value() == "2024-01-10 06:00:00"
        # new upstream row appears; replayed old rows stay filtered out
        rows.append({"id": "t3", "date_changed": "2024-01-11 00:00:00"})
        assert run() == ["t2", "t3"]  # D>= watermark: only t2 boundary + newer
        assert cur.value() == "2024-01-11 00:00:00"
        # upstream reverts to only-old data: nothing re-fetched, and the
        # cursor cannot shrink
        del rows[2]
        assert run() == []
        assert cur.value() == "2024-01-11 00:00:00"
    finally:
        server.shutdown()


def test_incremental_cursor_parses_not_string_compares(tmp_path):
    from mgo_liveagent_data_pipeline_spark.sources.rest import IncrementalCursor

    cur = IncrementalCursor(str(tmp_path), "tickets")
    # an unpadded-but-valid ISO variant still orders chronologically even
    # though it sorts BEFORE the current value lexicographically
    cur.advance("2024-01-09T00:00:00")
    cur.advance("2024-01-10 06:00:00")  # "2024-01-10 " < "2024-01-09T" as strings
    assert cur.value() == "2024-01-10 06:00:00"
    # malformed watermarks fail loudly instead of corrupting the cursor
    with pytest.raises(ValueError, match="ISO-8601"):
        cur.advance("1704844800")  # epoch seconds
    assert cur.value() == "2024-01-10 06:00:00"


def test_incremental_cursor_mixed_tz_watermarks(tmp_path):
    """An API that starts emitting '+00:00'-suffixed watermarks mid-stream
    must compare against the stored naive cursor (assumed UTC) instead of
    raising TypeError after the sink already committed."""
    from mgo_liveagent_data_pipeline_spark.sources.rest import IncrementalCursor

    cur = IncrementalCursor(str(tmp_path), "tickets")
    cur.advance("2024-01-10 00:00:00")          # naive
    cur.advance("2024-01-11T00:00:00+00:00")    # aware — must not throw
    assert cur.value() == "2024-01-11T00:00:00+00:00"
    cur.advance("2024-01-10T12:00:00")           # naive, behind: no-op
    assert cur.value() == "2024-01-11T00:00:00+00:00"
    cur.advance("2024-01-12T00:00:00+08:00")     # aware with offset, ahead
    assert cur.value() == "2024-01-12T00:00:00+08:00"
