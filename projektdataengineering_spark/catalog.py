"""Fixture-table catalog.

Generalizes the reference's single hard-coded source path
(``spark_tasks/weather_task.py:33,59`` reads one S3A folder of CSVs) into a
named-table loader over a directory of parquet files. Explicit behaviors:

* schema comes from parquet footers (self-describing columnar), never CSV
  inference — mirroring SURVEY.md §1.2's "explicit schemas" rule;
* loads are lazy DataFrames; registering temp views gives the SQL surface;
* at 100 TB these would be partitioned/bucketed catalog tables — the
  loader is the single seam where that swap happens (one `spark.read`
  call site for the whole engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that stay small at any scale factor (region/nation are
# fixed-cardinality in TPC-H-style schemas) — always broadcast these in
# joins; never shuffle them.
BROADCAST_TABLES = frozenset({"region", "nation"})


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond TIMESTAMP regardless of
    how the session's parquet reader surfaced it.

    The fixture generator has shipped the column as TIMESTAMP(NANOS)
    (older rounds) and TIMESTAMP(MICROS) (current); depending on the
    session's confs Spark surfaces those as LONG raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP_NTZ
    (``inferTimestampNTZ``) or TIMESTAMP. Queries must not depend on
    the caller's session config, so the branch is on the OBSERVED
    dtype, not on a conf:

    * LONG → floor-divide nanos to µs (bit-identical to DuckDB's own
      ns→µs truncation) and ``timestamp_micros``;
    * TIMESTAMP_NTZ → reinterpret the wall-clock as a session-tz
      instant (sessions are pinned UTC; DuckDB reads the same file as
      a naive TIMESTAMP, so canonical values agree);
    * TIMESTAMP → already what every downstream operator expects.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        _require_utc_session(df.sparkSession, "normalize_event_ts NTZ cast")
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


_UTC_NAMES = frozenset({"UTC", "GMT", "Etc/UTC", "Etc/GMT", "Z", "+00:00"})


def _require_utc_session(spark: SparkSession, what: str) -> None:
    """The NTZ branches reinterpret naive wall-clocks as session-tz
    instants; under a non-UTC session that silently SHIFTS every event
    timestamp. Fail loudly instead of corrupting instants."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_NAMES:
        raise RuntimeError(
            f"{what} requires spark.sql.session.timeZone=UTC (got {tz!r}): "
            "a TIMESTAMP_NTZ wall-clock cast under a non-UTC session would "
            "shift every event instant. Pin the session to UTC or convert "
            "explicitly with to_utc_timestamp."
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    ``events.ts`` is normalized to a µs TIMESTAMP whatever the file's
    physical timestamp unit and the session's reader confs — see
    :func:`normalize_event_ts`. (``nanosAsLong`` is still set
    defensively for sessions whose Spark honors it; pyspark 4.1.x
    ignores it and surfaces a timestamp type, which the dtype branch
    handles.)

    The returned frame is a per-session MEMO of the lazy scan, keyed on
    the file's identity (realpath, mtime_ns, size) — metadata reuse,
    NOT result caching: ``spark.read.parquet`` pays a driver-side file
    listing + footer schema resolution on every call (measured r19:
    ~100-160 ms each), the suite calls this hundreds of times per bench
    pass, and the resolved logical plan is immutable — every action on
    it (and on anything derived from it) still scans the parquet.
    Nothing is persisted, so the bench's between-query cache hygiene is
    unaffected. The memo lives ON the session object (a new session
    never sees another session's plans) and the mtime/size key means a
    regenerated fixture can never serve a stale relation.
    """
    import os

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    st = os.stat(path)
    key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
    memo = getattr(spark, "_pde_scan_memo", None)
    if memo is None:
        memo = {}
        spark._pde_scan_memo = memo
    df = memo.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if name == "events":
            df = normalize_event_ts(df)
        memo[key] = df
    return df


def load_events_since(spark: SparkSession, sf_dir: str, hwm) -> DataFrame:
    """events with ``ts > hwm``, with the predicate expressed against the
    RAW column type so it reaches the parquet scan.

    Filtering the NORMALIZED µs column would put the predicate above a
    projection Catalyst cannot always invert — the scan would read
    every row group. So the filter is applied pre-normalization, in the
    scan column's own type:

    * LONG raw nanos: in µs space ``floor(ns/1000) > H`` iff
      ``ns > H*1000 + 999`` — the rewritten raw predicate is exact;
    * TIMESTAMP_NTZ: the HWM's UTC wall-clock as an NTZ literal — a
      native comparison on the scan column;
    * TIMESTAMP: the HWM instant as a timestamp literal.

    All three show up in the scan's PushedFilters (asserted in
    tests/test_plans.py). At 100 TB on a ts-partitioned layout this is
    the difference between pruning to new partitions and a full scan.

    ``hwm`` may be None (bootstrap O3: take everything), a datetime, or
    an ISO string interpreted as UTC.
    """
    from datetime import datetime, timedelta, timezone

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if hwm is not None:
        if isinstance(hwm, str):
            hwm = datetime.fromisoformat(hwm)
        if hwm.tzinfo is None:
            hwm = hwm.replace(tzinfo=timezone.utc)
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
            hwm_us = (hwm - epoch) // timedelta(microseconds=1)
            df = df.filter(F.col("ts") > F.lit(hwm_us * 1000 + 999))
        elif isinstance(dt, TimestampNTZType):
            wall = hwm.astimezone(timezone.utc).replace(tzinfo=None)
            df = df.filter(
                F.col("ts") > F.lit(wall).cast("timestamp_ntz")
            )
        else:
            df = df.filter(F.col("ts") > F.lit(hwm))
    return normalize_event_ts(df)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view for the spark.sql surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition a scan that arrived with fewer partitions than the
    session's parallelism — a LOCAL-FIXTURE artifact (one sub-128MB
    parquet file → one input split → every downstream map stage runs
    as a single task; acute for Python-codec mapInPandas stages, where
    one task serializes the whole corpus's per-blob CPU). On a cluster
    against real data the scan already has thousands of splits, the
    condition is false, and NO extra exchange is planned — this never
    repartitions data that is already parallel."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_documents_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) repartitioned to full cluster width — THE shared
    entry point for every heavy text fan-out (tokenize / n-gram /
    hash-signature explodes). One definition of the round-11
    input-split lesson: the fixture documents parquet reads as ~2
    splits at sf1, and a fan-out stage planned at that width caps the
    whole family (measured repeatedly: substring dedup 10.3→2.3 s,
    the MinHash kernel 8-9→1.3-3 s, bigram_kn 3.4→2.0 s, BM25
    3.7→2.8 s). Consumers that must stay ZERO-shuffle by contract
    (text_char_diversity, text_quality_score) deliberately do not use
    it."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
