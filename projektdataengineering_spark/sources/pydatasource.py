"""Custom Python data source (Spark 4 DataSource API) — the engine's
source-EXTENSION seam.

The reference ingests from an object store with a fixed reader
(spark_tasks/weather_task.py:59-67); the generalized engine needs the
opposite capability too: plugging a NEW source format/system into the
scan side so it behaves like any built-in — schema known at plan time,
partitioned for parallel read, rows flowing straight into Catalyst.
PySpark 4 makes that a pure-Python exercise (``pyspark.sql.datasource``)
and this module implements it end-to-end with a deterministic synthetic
source, so the whole path is ORACLE-CHECKABLE: every generated cell is
a closed-form function of the row number (md5 of its decimal string),
which DuckDB can recompute from ``range(N)`` — the hash certifies the
partition math (every row exactly once across readers) and the payload
generation, value-for-value.

Scale shape: ``partitions()`` is the source's parallelism contract —
each InputPartition becomes one task reading an independent row range,
exactly how a JDBC/cloud-API source would shard (predicate/limit
pushdown hooks exist on DataSourceReader for sources that support
them). Nothing flows through the driver.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("rows", N)`` — a
    deterministic generated table (row_id, bucket, payload)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "row_id bigint, bucket int, payload string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "8"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        i = partition.value
        lo = self.n_rows * i // self.n_parts
        hi = self.n_rows * (i + 1) // self.n_parts
        for r in range(lo, hi):
            yield (r, r % 10, hashlib.md5(str(r).encode()).hexdigest())


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest wins, matching Spark's own semantics)."""
    spark.dataSource.register(SyntheticDocsDataSource)
