"""HTTP geocode transports over loopback Nominatim/Photon-shaped endpoints:
request shape, retry/backoff, provider chaining, and the end-to-end Spark
fallback stage POSTing from worker processes."""
from __future__ import annotations

import json
import threading

import pytest


@pytest.fixture()
def geo_api():
    """Loopback server answering both Nominatim (``/search``) and Photon
    (``/api``) GETs. ``plans`` maps path-prefix -> list of response plans,
    consumed per request (last repeats): ("ok", payload), ("status", code).
    Every request URL is recorded in ``seen``."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen: list[str] = []
    plans: dict[str, list] = {"/search": [], "/api": []}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen.append(self.path)
            key = "/search" if self.path.startswith("/search") else "/api"
            qplans = plans[key]
            plan = qplans.pop(0) if len(qplans) > 1 else (
                qplans[0] if qplans else ("ok", [])
            )
            kind, arg = plan
            if kind == "status":
                self.send_response(arg)
                self.end_headers()
                return
            body = json.dumps(arg).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", seen, plans
    finally:
        srv.shutdown()


def _osm(base, **kw):
    from mgo_liveagent_data_pipeline_spark.enrich.geocode import HttpOsmGeocoder

    kw.setdefault("backoff_s", 0.0)
    return HttpOsmGeocoder(base_url=base, **kw)


def _photon(base, **kw):
    from mgo_liveagent_data_pipeline_spark.enrich.geocode import (
        HttpPhotonGeocoder,
    )

    kw.setdefault("backoff_s", 0.0)
    return HttpPhotonGeocoder(base_url=base, **kw)


def test_osm_request_shape_and_result(geo_api):
    base, seen, plans = geo_api
    plans["/search"].append(("ok", [{"lat": "14.5995", "lon": "120.9842"}]))
    res = _osm(base)("Manila City Hall")
    assert res == ("Manila City Hall, Philippines", 14.5995, 120.9842)
    # reference request shape: suffixed q, format=json, limit=1
    assert "q=Manila+City+Hall%2C+Philippines" in seen[0]
    assert "format=json" in seen[0] and "limit=1" in seen[0]


def test_osm_zero_results_is_none_not_error(geo_api):
    base, _, plans = geo_api
    plans["/search"].append(("ok", []))
    assert _osm(base)("Nowhere") is None


def test_osm_retries_on_503_then_succeeds(geo_api):
    base, seen, plans = geo_api
    plans["/search"] += [("status", 503),
                         ("ok", [{"lat": "1.0", "lon": "2.0"}])]
    res = _osm(base)("X")
    assert res is not None and res[1] == 1.0
    assert len(seen) == 2  # one retry


def test_osm_permanent_4xx_raises_immediately(geo_api):
    import urllib.error

    base, seen, plans = geo_api
    plans["/search"].append(("status", 403))
    with pytest.raises(urllib.error.HTTPError):
        _osm(base)("X")
    assert len(seen) == 1  # no retries on a permanent status


def test_photon_swaps_lonlat(geo_api):
    base, seen, plans = geo_api
    plans["/api"].append(
        ("ok", {"features": [
            {"geometry": {"coordinates": [120.98, 14.6]}}]})
    )
    res = _photon(base)("Quezon")
    assert res == ("Quezon, Philippines", 14.6, 120.98)
    assert seen[0].startswith("/api?") and "limit=1" in seen[0]


def test_chain_falls_through_miss_and_error(geo_api):
    from mgo_liveagent_data_pipeline_spark.enrich.geocode import ChainGeocoder

    base, seen, plans = geo_api
    # OSM: empty result (miss) -> Photon answers
    plans["/search"].append(("ok", []))
    plans["/api"].append(
        ("ok", {"features": [{"geometry": {"coordinates": [2.0, 1.0]}}]})
    )
    chain = ChainGeocoder(_osm(base), _photon(base))
    assert chain("A") == ("A, Philippines", 1.0, 2.0)

    # OSM: hard down (exhausts retries) -> Photon still answers
    plans["/search"][:] = [("status", 500), ("status", 500), ("status", 500)]
    assert chain("B") == ("B, Philippines", 1.0, 2.0)

    # both dry -> None (unresolved row, not an exception)
    plans["/api"][:] = [("ok", {"features": []})]
    assert chain("C") is None


def test_chain_requires_a_link():
    from mgo_liveagent_data_pipeline_spark.enrich.geocode import ChainGeocoder

    with pytest.raises(ValueError):
        ChainGeocoder()


def test_spark_fallback_stage_over_real_http(geo_api, spark):
    """End to end: gazetteer misses flow through mapInPandas workers that
    GET the loopback OSM endpoint."""
    from mgo_liveagent_data_pipeline_spark.enrich.geocode import (
        geocode_with_fallback,
    )

    base, seen, plans = geo_api
    plans["/search"].append(("ok", [{"lat": "10.5", "lon": "122.5"}]))

    addresses = spark.createDataFrame(
        [("iloilo city proper",), ("zzz qqq xxyy",)], ["address"]
    )
    gaz = spark.createDataFrame(
        [("iloilo city proper", "municity", 1, 1, 10.7, 122.56)],
        ["address", "geo_level", "municity_code", "provdist_code",
         "latitude", "longitude"],
    )
    out = {
        r["address"]: r
        for r in geocode_with_fallback(
            addresses, gaz, external=_osm(base), threshold=0.9,
            throttle=False,
        ).collect()
    }
    assert out["iloilo city proper"]["source"] == "gazetteer"
    ext = out["zzz qqq xxyy"]
    assert ext["source"] == "external"
    assert ext["latitude"] == 10.5 and ext["longitude"] == 122.5
    assert ext["matched_address"] == "zzz qqq xxyy, Philippines"
    assert any("zzz+qqq+xxyy" in p for p in seen)
