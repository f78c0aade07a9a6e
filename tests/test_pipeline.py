"""End-to-end batch pipeline tests: the reference's weather_task main()
re-expressed Spark-first (pipeline.run_incremental_batch), over real
temp directories — bootstrap, incremental second batch, replay
idempotence, archive layout (O6), and the single-action row count (O5).
"""

from __future__ import annotations

import os
import pathlib
import textwrap
from datetime import datetime, timezone

import pytest

from projektdataengineering_spark.pipeline import run_incremental_batch
from projektdataengineering_spark.sources import WEATHER_CASTS, weather_raw_schema

BATCH1 = textwrap.dedent(
    """\
    EventId,Type,Severity,StartTimeUTC,EndTimeUTC,PrecipitationIn,TimeZone,AirportCode,LocationLat,LocationLng,City,County,State,ZipCode
    W-1,Rain,Light,2022-01-01 00:00:00,2022-01-01 01:30:00,0.03,US/Eastern,KJFK,40.6413,-73.7781,New York,Queens,NY,11430
    W-2,Snow,Heavy,2022-01-01 00:20:00,2022-01-01 04:00:00,0.71,US/Central,KORD,41.9742,-87.9073,Chicago,Cook,IL,60666
    """
)

# W-3 is strictly newer; W-LATE is at exactly the batch-1 HWM (must be
# dropped: strict >, O1); W-OLD is older (late data, dropped: O2).
BATCH2 = textwrap.dedent(
    """\
    EventId,Type,Severity,StartTimeUTC,EndTimeUTC,PrecipitationIn,TimeZone,AirportCode,LocationLat,LocationLng,City,County,State,ZipCode
    W-3,Fog,Severe,2022-01-01 02:00:00,2022-01-01 02:40:00,0.00,US/Pacific,KLAX,33.9416,-118.4085,Los Angeles,Los Angeles,CA,90045
    W-LATE,Rain,Light,2022-01-01 00:20:00,2022-01-01 01:00:00,0.10,US/Eastern,KBOS,42.3656,-71.0096,Boston,Suffolk,MA,02128
    W-OLD,Hail,Severe,2021-12-31 20:00:00,2021-12-31 21:00:00,0.50,US/Eastern,KPHL,39.8729,-75.2437,Philadelphia,Philadelphia,PA,19153
    """
)


@pytest.fixture()
def dirs(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    return {
        "landing": landing,
        "warehouse": str(tmp_path / "warehouse"),
        "archive": str(tmp_path / "archive"),
    }


def _run(spark, dirs, when):
    return run_incremental_batch(
        spark,
        landing_path=str(dirs["landing"]),
        warehouse_path=dirs["warehouse"],
        archive_root=dirs["archive"],
        dataset="weather_data",
        ts_col="StartTimeUTC",
        casts=WEATHER_CASTS,
        schema=weather_raw_schema(),
        now=when,
    )


def test_bootstrap_then_incremental_then_replay(spark, dirs):
    t1 = datetime(2022, 1, 8, 12, 0, 0, tzinfo=timezone.utc)
    (dirs["landing"] / "b1.csv").write_text(BATCH1)
    r1 = _run(spark, dirs, t1)
    assert r1.rows_written == 2  # O3: empty warehouse takes everything
    assert r1.high_water_mark is None
    assert len(r1.archived) == 1

    # landing dir now empty (file archived); second batch arrives
    (dirs["landing"] / "b2.csv").write_text(BATCH2)
    t2 = datetime(2022, 1, 15, 12, 0, 0, tzinfo=timezone.utc)
    r2 = _run(spark, dirs, t2)
    assert r2.rows_written == 1  # only W-3: O1 strict > drops W-LATE, O2 drops W-OLD
    assert r2.high_water_mark == datetime(2022, 1, 1, 0, 20, 0)

    wh = spark.read.parquet(dirs["warehouse"])
    assert sorted(r["EventId"] for r in wh.select("EventId").collect()) == [
        "W-1",
        "W-2",
        "W-3",
    ]

    # replay the same batch (crash-between-write-and-archive scenario):
    # HWM now at W-3's ts → zero rows, warehouse unchanged
    (dirs["landing"] / "b2_replay.csv").write_text(BATCH2)
    r3 = _run(spark, dirs, datetime(2022, 1, 15, 13, 0, 0, tzinfo=timezone.utc))
    assert r3.rows_written == 0
    assert spark.read.parquet(dirs["warehouse"]).count() == 3


def test_archive_layout_is_dated_o6(spark, dirs):
    (dirs["landing"] / "b1.csv").write_text(BATCH1)
    when = datetime(2022, 1, 8, 9, 30, 45, tzinfo=timezone.utc)
    r = _run(spark, dirs, when)
    (dst,) = r.archived
    assert dst.endswith("archive/weather_data/2022-01-08/093045_b1.csv"), dst
    assert os.path.exists(dst.removeprefix("file:"))
    # source file is gone from the landing zone
    assert list(dirs["landing"].glob("*.csv")) == []


def test_streaming_ingest_with_native_archive(spark, dirs, tmp_path):
    """Streaming-native ingest: file source + cleanSource=archive. The
    checkpoint is the high-water mark — re-running with no new files
    writes nothing; processed files leave the landing zone."""
    import time

    from projektdataengineering_spark.pipeline import run_streaming_ingest

    (dirs["landing"] / "b1.csv").write_text(BATCH1)
    ckpt = str(tmp_path / "ckpt")
    n1 = run_streaming_ingest(
        spark,
        landing_path=str(dirs["landing"]),
        warehouse_path=dirs["warehouse"],
        archive_root=dirs["archive"],
        checkpoint_path=ckpt,
        casts=WEATHER_CASTS,
        schema=weather_raw_schema(),
    )
    assert n1 == 2
    wh = spark.read.parquet(dirs["warehouse"])
    assert wh.count() == 2
    assert dict(wh.dtypes)["StartTimeUTC"] == "timestamp"

    # replay with nothing new: checkpoint suppresses re-ingest
    n2 = run_streaming_ingest(
        spark,
        landing_path=str(dirs["landing"]),
        warehouse_path=dirs["warehouse"],
        archive_root=dirs["archive"],
        checkpoint_path=ckpt,
        casts=WEATHER_CASTS,
        schema=weather_raw_schema(),
    )
    assert n2 == 0
    assert spark.read.parquet(dirs["warehouse"]).count() == 2

    # a NEW file advances the log; committing the next batch lets the
    # async cleaner archive the fully-processed earlier file
    (dirs["landing"] / "b2.csv").write_text(BATCH2)
    n3 = run_streaming_ingest(
        spark,
        landing_path=str(dirs["landing"]),
        warehouse_path=dirs["warehouse"],
        archive_root=dirs["archive"],
        checkpoint_path=ckpt,
        casts=WEATHER_CASTS,
        schema=weather_raw_schema(),
    )
    assert n3 == 3
    assert spark.read.parquet(dirs["warehouse"]).count() == 5

    deadline = time.time() + 20
    while time.time() < deadline and (dirs["landing"] / "b1.csv").exists():
        time.sleep(0.5)
    assert not (dirs["landing"] / "b1.csv").exists()
    archived = [str(p) for p in pathlib.Path(dirs["archive"]).rglob("b1.csv")]
    assert archived, "b1.csv not found under the archive root"


def test_json_lines_roundtrip_and_corrupt_records(spark, tmp_path):
    """JSON edge format: write→read round-trips values and nulls
    losslessly under the explicit schema; a malformed line surfaces in
    _corrupt_record instead of failing the batch."""
    from pyspark.sql import types as T

    from projektdataengineering_spark.sources import read_json_lines, write_json_lines

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    rows = [(1, "alpha", 0.5), (2, None, 2.25), (3, "gamma", None)]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "json_out")
    write_json_lines(df, out)
    back = read_json_lines(spark, out, schema).cache()
    got = sorted(
        (r["id"], r["name"], r["score"]) for r in back.select("id", "name", "score").collect()
    )
    assert got == sorted(rows)
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0

    corrupt_dir = tmp_path / "json_corrupt"
    corrupt_dir.mkdir()
    (corrupt_dir / "part-0.json").write_text(
        '{"id": 7, "name": "ok", "score": 1.0}\nnot json at all\n'
    )
    mixed = read_json_lines(spark, str(corrupt_dir), schema).cache()
    assert mixed.filter("_corrupt_record IS NOT NULL").count() == 1
    assert mixed.filter("id = 7").count() == 1


def test_jdbc_read_wrapper_reaches_spark_jdbc_source(spark):
    """No database ships in this sandbox, so the boundary test proves
    the WIRING: the pushed-subquery dbtable and options must reach
    Spark's JDBC relation provider, which then fails on the missing
    driver — a failure naming the driver/connection, not our wrapper."""
    from projektdataengineering_spark.sources import (
        jdbc_pushed_query,
        read_jdbc_pushdown,
    )

    q = jdbc_pushed_query("SELECT MAX(ts) AS hwm FROM warehouse.events")
    assert q == "(SELECT MAX(ts) AS hwm FROM warehouse.events) AS pushed"
    with pytest.raises(Exception) as ei:
        read_jdbc_pushdown(
            spark,
            url="jdbc:postgresql://localhost:1/nope",
            table_or_query=q,
            properties={"user": "u", "password": "p", "driver": "org.postgresql.Driver"},
        )
    msg = str(ei.value)
    # Spark's JDBC source took over: the error is about the driver class
    # or the connection, never about our option plumbing
    assert "org.postgresql.Driver" in msg or "Connection" in msg, msg


def test_s3a_session_hook_sets_hadoop_conf(spark):
    """configure_s3a must land every reference-parity key on the live
    Hadoop configuration (endpoint, creds, path-style, provider)."""
    from projektdataengineering_spark.session import configure_s3a

    configure_s3a(
        spark, endpoint="http://localhost:9000", access_key="ak", secret_key="sk"
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.secret.key") == "sk"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert (
        hconf.get("fs.s3a.aws.credentials.provider")
        == "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    )


def test_surrogate_key_uuid_column_d1(spark, dirs):
    """SURVEY §2.1 D1: the warehouse write can generate a UUID
    surrogate key per written row (reference postgres/init.sql:2
    ``gen_random_uuid()``). Non-deterministic by design — assert
    schema + per-row uniqueness + RFC-4122 shape, never values; and
    replay idempotence must NOT depend on it (HWM drops the replay
    before any uuid is generated)."""
    import re

    (dirs["landing"] / "b1.csv").write_text(BATCH1)
    res = run_incremental_batch(
        spark,
        landing_path=str(dirs["landing"]),
        warehouse_path=dirs["warehouse"],
        archive_root=dirs["archive"],
        dataset="weather_data",
        ts_col="StartTimeUTC",
        casts=WEATHER_CASTS,
        schema=weather_raw_schema(),
        now=datetime(2022, 1, 2, tzinfo=timezone.utc),
        surrogate_key="row_uuid",
    )
    assert res.rows_written == 2
    wh = spark.read.parquet(dirs["warehouse"])
    assert wh.schema["row_uuid"].dataType.simpleString() == "string"
    rows = wh.select("row_uuid", "EventId").collect()
    uuids = [r.row_uuid for r in rows]
    assert len(set(uuids)) == len(uuids) == 2
    v4 = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    assert all(v4.match(u) for u in uuids), uuids

    # replay: same file again → zero new rows, uuid set unchanged
    (dirs["landing"] / "b1_replay.csv").write_text(BATCH1)
    res2 = run_incremental_batch(
        spark,
        landing_path=str(dirs["landing"]),
        warehouse_path=dirs["warehouse"],
        archive_root=dirs["archive"],
        dataset="weather_data",
        ts_col="StartTimeUTC",
        casts=WEATHER_CASTS,
        schema=weather_raw_schema(),
        now=datetime(2022, 1, 3, tzinfo=timezone.utc),
        surrogate_key="row_uuid",
    )
    assert res2.rows_written == 0
    after = {r.row_uuid for r in spark.read.parquet(dirs["warehouse"]).select("row_uuid").collect()}
    assert after == set(uuids)
