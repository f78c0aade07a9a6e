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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects. We read it as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong`` — set defensively here
    because the caller may own the session) and floor-divide to a
    microsecond TIMESTAMP — bit-identical to DuckDB's own ns→µs
    truncation, so oracle comparisons agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events_since(spark: SparkSession, sf_dir: str, hwm) -> DataFrame:
    """events with ``ts > hwm``, with the predicate rewritten onto the
    RAW nanos long so it reaches the parquet scan.

    Filtering the converted µs column (``timestamp_micros(ts div 1000)``)
    puts the predicate above a projection Catalyst cannot invert — the
    scan would read every row group. In µs space ``floor(ns/1000) > H``
    iff ``ns > H*1000 + 999``, so the equivalent raw predicate is exact
    and shows up in the scan's PushedFilters (asserted in
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
        epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
        hwm_us = (hwm - epoch) // timedelta(microseconds=1)
        df = df.filter(F.col("ts") > F.lit(hwm_us * 1000 + 999))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view for the spark.sql surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
