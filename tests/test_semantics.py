"""Semantic unit tests for the reference's incremental-load behaviors
(SURVEY.md §2.2 O1–O6, FIXTURES.md §B scenarios) over the weather schema.
"""

from __future__ import annotations

import textwrap

import pytest

from projektdataengineering_spark.operators.incremental import (
    dedup_incremental,
    high_water_mark,
    incremental_filter,
)
from projektdataengineering_spark.sources import read_csv_with_casts

CSV = textwrap.dedent(
    """\
    EventId,Type,Severity,StartTimeUTC,EndTimeUTC,PrecipitationIn,TimeZone,AirportCode,LocationLat,LocationLng,City,County,State,ZipCode
    W-1,Rain,Light,2022-01-01 00:00:00,2022-01-01 01:30:00,0.03,US/Eastern,KJFK,40.6413,-73.7781,New York,Queens,NY,11430
    W-2,Snow,Heavy,2022-01-01 00:20:00,2022-01-01 04:00:00,0.71,US/Central,KORD,41.9742,-87.9073,Chicago,Cook,IL,60666
    W-3,Fog,Severe,2021-12-31 23:50:00,2022-01-01 00:40:00,0.00,US/Pacific,KLAX,33.9416,-118.4085,Los Angeles,Los Angeles,CA,90045
    W-4,Hail,Severe,not-a-timestamp,2022-01-02 00:00:00,lots,US/Eastern,KBOS,42.3656,-71.0096,Boston,Suffolk,MA,02128
    """
)


@pytest.fixture(scope="module")
def weather(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("weather") / "events.csv"
    p.write_text(CSV)
    return read_csv_with_casts(spark, str(p)).cache()


def test_cast_layer_types_and_null_on_unparseable(weather):
    # FIXTURES §B scenario 5: bad timestamp/decimal → NULL, never a crash
    types = dict(weather.dtypes)
    assert types["StartTimeUTC"] == "timestamp"
    assert types["PrecipitationIn"] == "decimal(7,2)"
    bad = weather.filter("EventId = 'W-4'").first()
    assert bad["StartTimeUTC"] is None
    assert bad["PrecipitationIn"] is None
    assert bad["EndTimeUTC"] is not None


def test_hwm_boundary_strict_greater(weather):
    # O1: a row exactly AT the high-water mark must be dropped
    out = incremental_filter(weather, "StartTimeUTC", "2022-01-01 00:00:00")
    ids = {r["EventId"] for r in out.collect()}
    assert ids == {"W-2"}  # W-1 is exactly at the mark → dropped


def test_bootstrap_empty_warehouse_takes_all(weather):
    # O3: hwm None → everything (including the NULL-ts row, as in the
    # reference where no filter is applied at all)
    out = incremental_filter(weather, "StartTimeUTC", None)
    assert out.count() == 4


def test_late_data_silently_dropped(weather):
    # O2: rows older than the mark never land in batch mode
    out = incremental_filter(weather, "StartTimeUTC", "2021-12-31 23:55:00")
    ids = {r["EventId"] for r in out.collect()}
    assert "W-3" not in ids and ids == {"W-1", "W-2"}


def test_high_water_mark_roundtrip(weather):
    hwm = high_water_mark(weather, "StartTimeUTC")
    assert hwm is not None
    out = incremental_filter(weather, "StartTimeUTC", hwm)
    assert out.count() == 0  # nothing strictly newer than the max


def test_replay_idempotence(spark, weather):
    # O4 fix: replaying the same batch through dedup_incremental → 0 rows
    warehouse = weather.filter("EventId in ('W-1','W-2')")
    first = dedup_incremental(weather, warehouse, "EventId")
    assert {r["EventId"] for r in first.collect()} == {"W-3", "W-4"}
    # after "loading" everything, a replay adds nothing
    replay = dedup_incremental(weather, weather, "EventId")
    assert replay.count() == 0


def test_ntz_normalization_requires_utc_session(spark, tmp_path):
    """The NTZ branch of normalize_event_ts reinterprets naive
    wall-clocks as session-tz instants; under a non-UTC session that
    would silently SHIFT every event instant, so it must fail loudly
    instead (ADVICE r4)."""
    import pytest
    from pyspark.sql import functions as F

    from projektdataengineering_spark.catalog import normalize_event_ts

    df = spark.range(3).select(
        F.timestamp_micros(F.col("id") * 1_000_000).cast("timestamp_ntz").alias("ts")
    )
    tz_key = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        with pytest.raises(RuntimeError, match="timeZone"):
            normalize_event_ts(df)
        spark.conf.set(tz_key, "UTC")
        out = normalize_event_ts(df)
        assert out.schema["ts"].dataType.typeName() == "timestamp"
    finally:
        spark.conf.set(tz_key, old)
