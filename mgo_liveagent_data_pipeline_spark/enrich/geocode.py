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
