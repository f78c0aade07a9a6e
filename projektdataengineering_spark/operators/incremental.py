"""Incremental (high-water-mark) load operators — the reference's one
non-trivial semantic, made into a reusable library.

Reference behaviors reproduced/fixed (SURVEY.md §2.2):

* O1  strictly-greater-than predicate on the event-time column
      (/root/reference/spark_tasks/weather_task.py:74,82)
* O2  late/out-of-order rows silently dropped in batch mode (the
      streaming mirrors in ``streaming/`` replace this with watermarks)
* O3  empty-warehouse bootstrap: hwm None → take everything
      (weather_task.py:80-84)
* O4  the reference's error path falls back to an unfiltered full append
      (duplicate risk, weather_task.py:86-89); we *fail* instead and
      provide ``dedup_incremental`` (anti-join on the business key) so
      replays are idempotent.

Scale notes: ``high_water_mark`` is a scalar aggregate (parquet footer
stats make it metadata-mostly; the single row is the only driver-side
collect in the whole library). ``incremental_filter`` is a plain
pushdown-able predicate — on a date-partitioned table it prunes
partitions, which is the 100-TB design: the HWM read touches stats, the
filter touches only new partitions. ``dedup_incremental``'s anti-join
shuffles both sides on the key; at scale, feed ``existing`` as only the
key column (column pruning keeps the shuffle narrow) or a Bloom-filter
pre-pass.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def high_water_mark(df: DataFrame, ts_col: str):
    """Current high-water mark: max(ts) as a Python scalar (None if empty).

    The reference pushes this into the warehouse via a hand-written JDBC
    subquery (weather_task.py:72-76); engine-native form is a scalar agg.
    """
    row = df.agg(F.max(ts_col).alias("hwm")).first()
    return row["hwm"] if row else None


def incremental_filter(
    df: DataFrame, ts_col: str, hwm: datetime | str | None
) -> DataFrame:
    """Keep rows strictly newer than ``hwm`` (O1); ``None`` → all rows (O3).

    Strict ``>`` means a row timestamped exactly at the HWM is dropped —
    the reference's boundary semantic, covered by tests.
    """
    if hwm is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(hwm))


def dedup_incremental(batch: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """Idempotent append set: batch rows whose ``key`` is not yet present.

    Left-anti join on the business key — replaying the same batch yields
    zero rows, fixing the reference's duplicate-on-error risk (O4).
    """
    return batch.join(existing.select(key), on=key, how="left_anti")
