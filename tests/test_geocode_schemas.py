"""U2 geocode-with-fallback, S8 CSV scan, K3 explicit schemas."""
from __future__ import annotations

from mgo_liveagent_data_pipeline_spark import schemas
from mgo_liveagent_data_pipeline_spark.enrich.geocode import (
    geocode_with_fallback,
    stub_external_geocoder,
)
from mgo_liveagent_data_pipeline_spark.sources.tables import load_csv


def gazetteer_df(spark):
    return spark.createDataFrame(
        [
            ("santa rosa", "municity", "10", "1", 14.3, 121.1),
            ("laguna", "provdist", "-1", "1", 14.2, 121.3),
            ("santa rosa east", "barangay", "10", "1", 14.31, 121.11),
        ],
        ["address", "geo_level", "municity_code", "provdist_code", "latitude", "longitude"],
    )


def test_geocode_bulk_hits_skip_external(spark):
    addrs = spark.createDataFrame([("santa rossa",)], ["address"])

    def exploding(address):  # must never be called — gazetteer resolves it
        raise AssertionError("external geocoder called for a gazetteer hit")

    out = geocode_with_fallback(
        addrs, gazetteer_df(spark), external=exploding, throttle=False
    ).collect()
    assert len(out) == 1
    assert out[0]["source"] == "gazetteer"
    assert out[0]["latitude"] is not None


def test_geocode_misses_go_external(spark):
    addrs = spark.createDataFrame(
        [("santa rossa",), ("zzqqxx 12345",)], ["address"]
    )
    out = {
        r["address"]: r
        for r in geocode_with_fallback(
            addrs, gazetteer_df(spark), throttle=False
        ).collect()
    }
    assert out["santa rossa"]["source"] == "gazetteer"
    ext = out["zzqqxx 12345"]
    assert ext["source"] in ("external", "unresolved")
    if ext["source"] == "external":
        assert -90 <= ext["latitude"] <= 90
        assert -180 <= ext["longitude"] <= 180


def test_stub_geocoder_deterministic():
    assert stub_external_geocoder("x") == stub_external_geocoder("x")


def test_load_csv_with_schema(spark, tmp_path):
    p = tmp_path / "serviceable.csv"
    p.write_text(
        "municipality_id,province_id,municipality_name,is_serviceable,"
        "created_at,updated_at,nearest_hub_id,hub_name\n"
        "1,10,City of Antipolo (Capital),1,2024-01-01,2024-01-02,h1,Hub One\n"
    )
    df = load_csv(spark, str(p), schema=schemas.serviceable_schema())
    row = df.collect()[0]
    assert row["municipality_id"] == 1
    assert row["municipality_name"] == "City of Antipolo (Capital)"


def test_all_domain_schemas_parse(spark):
    for fn in (
        schemas.tickets_schema,
        schemas.messages_schema,
        schemas.users_schema,
        schemas.agents_schema,
        schemas.tags_schema,
        schemas.convo_analysis_schema,
        schemas.logs_schema,
        schemas.gazetteer_schema,
        schemas.serviceable_schema,
    ):
        s = fn()
        assert len(s.fields) > 0
