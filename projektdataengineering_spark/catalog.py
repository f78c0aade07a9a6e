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


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view for the spark.sql surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
