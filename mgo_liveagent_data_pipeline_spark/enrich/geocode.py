"""U2 — geocoding with external-API fallback (core/Geocode.py:91-157).

Reference shape: per address — try the gazetteer similarity match (J5); on
miss call Nominatim, then Photon, with ≥1.25 s between OSM calls.

Spark shape: the bulk resolves through the native two-phase similarity
join (zero external calls); only the residual miss set — typically a tiny
fraction — flows through a rate-limited ``mapInPandas`` stage. The
external client is injected as a callable so tasks stay pure/retry-safe
(tests inject a deterministic stub; production injects the HTTP client).

Scale notes: the miss set is coalesced to ``max_external_partitions`` so
global external-call pressure is bounded at partitions × rate — the
distributed analogue of the reference's single-process 1.25 s sleep.
"""
from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.joins import two_phase_similarity_join
from ..sources.rest import TokenBucket

GEOCODE_RESULT_FIELDS = [
    "address",
    "matched_address",
    "latitude",
    "longitude",
    "source",
]

NOMINATIM_RATE_PER_MIN = 48.0  # ≥1.25 s between calls (core/Geocode.py:95-99)


def stub_external_geocoder(address: str) -> tuple[str, float, float] | None:
    """Deterministic fake external geocoder: md5-derived coordinates,
    misses (returns None) for addresses hashing to an 'f' first nibble —
    exercising the unresolved-row path."""
    h = hashlib.md5(address.encode("utf-8")).hexdigest()
    if h[0] == "f":
        return None
    lat = int(h[:6], 16) % 18000 / 100.0 - 90.0
    lon = int(h[6:12], 16) % 36000 / 100.0 - 180.0
    return (address.upper(), lat, lon)


class HttpOsmGeocoder:
    """Production transport for the external-geocode fallback: the
    reference's Nominatim call (core/Geocode.py:129-143 — GET
    ``/search?q=<addr + ', Philippines'>&format=json&limit=1`` with a
    User-Agent header, first result's lat/lon). Returned
    ``matched_address`` is the suffixed query string, exactly what the
    reference records as ``address`` on its fallback rows
    (core/Geocode.py:103-110).

    On top of the reference (which swallows every error): bounded retry
    with exponential backoff on 429/5xx/transport errors via the shared
    ``gateway.http_retry`` state machine; other 4xx raise immediately.
    Zero results → None (the caller's ``unresolved`` row). Stdlib urllib
    only — instances cloudpickle into Spark python workers; pace calls
    with the enclosing ``geocode_with_fallback`` token bucket (the
    distributed analogue of the reference's 1.25 s sleep), not here.
    ``transport(url) -> bytes`` is injectable for tests, same pattern as
    ``HttpGateway``.
    """

    def __init__(
        self,
        base_url: str = "https://nominatim.openstreetmap.org",
        suffix: str = ", Philippines",
        user_agent: str = "mgo-pipeline-geocoder",
        max_retries: int = 3,
        backoff_s: float = 0.2,
        transport: Callable[[str], bytes] | None = None,
        sleep: Callable[[float], None] | None = None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.suffix = suffix
        self.user_agent = user_agent
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.transport = transport
        self.sleep = sleep

    def _url(self, full_address: str) -> str:
        from urllib.parse import urlencode

        q = urlencode({"q": full_address, "format": "json", "limit": 1})
        return f"{self.base_url}/search?{q}"

    def _get(self, url: str) -> bytes:
        if self.transport is not None:
            return self.transport(url)
        import urllib.request

        req = urllib.request.Request(
            url, headers={"User-Agent": self.user_agent}
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.read()

    def _fetch(self, url: str) -> bytes:
        from .gateway import http_retry

        return http_retry(
            lambda: self._get(url),
            max_retries=self.max_retries,
            backoff_s=self.backoff_s,
            sleep=self.sleep,
            what="geocode endpoint",
        )

    def _parse(self, raw: bytes) -> tuple[float, float] | None:
        import json

        data = json.loads(raw.decode("utf-8"))
        if not data:
            return None
        return float(data[0]["lat"]), float(data[0]["lon"])

    def __call__(self, address: str) -> tuple[str, float, float] | None:
        full = address + self.suffix
        coords = self._parse(self._fetch(self._url(full)))
        if coords is None:
            return None
        return (full, coords[0], coords[1])


class HttpPhotonGeocoder(HttpOsmGeocoder):
    """The reference's second external link (core/Geocode.py:144-157):
    Photon GET ``/api?q=<addr + suffix>&limit=1``, GeoJSON response,
    ``features[0].geometry.coordinates`` is (lon, lat) — note the swap.
    Same retry/transport/suffix contract as ``HttpOsmGeocoder``."""

    def __init__(self, base_url: str = "https://photon.komoot.io", **kw) -> None:
        super().__init__(base_url=base_url, **kw)

    def _url(self, full_address: str) -> str:
        from urllib.parse import urlencode

        q = urlencode({"q": full_address, "limit": 1})
        return f"{self.base_url}/api?{q}"

    def _parse(self, raw: bytes) -> tuple[float, float] | None:
        import json

        features = json.loads(raw.decode("utf-8")).get("features")
        if not features:
            return None
        lon, lat = features[0]["geometry"]["coordinates"][:2]
        return float(lat), float(lon)


class ChainGeocoder:
    """OSM → Photon cascade (core/Geocode.py:100-128): each link is tried
    in order; a link that raises (after its own retries) or returns None
    falls through to the next. Unlike the LLM ``FallbackGateway`` —
    which only chains on exception — a geocoder returning "no result" is
    also a reason to try the next provider, because the reference treats
    empty Nominatim results exactly that way. All links exhausted → None,
    which the enclosing ``geocode_with_fallback`` turns into the
    ``unresolved`` row (never a task failure)."""

    def __init__(self, *links: Callable[[str], tuple[str, float, float] | None]) -> None:
        if not links:
            raise ValueError("ChainGeocoder needs at least one link")
        self.links = links

    def __call__(self, address: str) -> tuple[str, float, float] | None:
        for link in self.links:
            try:
                res = link(address)
            except Exception:
                continue
            if res is not None:
                return res
        return None


def geocode_with_fallback(
    addresses: DataFrame,
    gazetteer: DataFrame,
    external: Callable[[str], tuple[str, float, float] | None] = stub_external_geocoder,
    addr_col: str = "address",
    gaz_col: str = "address",
    n: int = 3,
    threshold: float = 0.1,
    rate_per_min: float = NOMINATIM_RATE_PER_MIN,
    throttle: bool = True,
    max_external_partitions: int = 1,
) -> DataFrame:
    """addresses(addr_col) × gazetteer(gaz_col, geo_level, codes, lat/lon)
    → (address, matched_address, latitude, longitude, source)."""
    hits = two_phase_similarity_join(
        addresses,
        gazetteer,
        addr_col=addr_col,
        gaz_col=gaz_col,
        n=n,
        threshold=threshold,
    )
    matched_col = f"matched_{gaz_col}"
    resolved = hits.select(
        F.col(addr_col).alias("address"),
        F.col(matched_col).alias("matched_address"),
        F.col("latitude"),
        F.col("longitude"),
        F.lit("gazetteer").alias("source"),
    )
    misses = addresses.select(F.col(addr_col).alias("address")).join(
        resolved.select("address"), on="address", how="left_anti"
    )

    out_schema = T.StructType(
        [
            T.StructField("address", T.StringType()),
            T.StructField("matched_address", T.StringType()),
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
            T.StructField("source", T.StringType()),
        ]
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate_per_min) if throttle else None
        for pdf in batches:
            rows = []
            for addr in pdf["address"]:
                if bucket is not None:
                    bucket.acquire()
                res = external(addr)
                if res is None:
                    rows.append((addr, None, None, None, "unresolved"))
                else:
                    m, lat, lon = res
                    rows.append((addr, m, lat, lon, "external"))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    fallback = misses.coalesce(max_external_partitions).mapInPandas(
        fetch, out_schema
    )
    return resolved.unionByName(fallback)
