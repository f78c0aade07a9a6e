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


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance: mergeable per-key state
# ---------------------------------------------------------------------------

def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Partial aggregate STATE for incremental rollup maintenance:
    per key — row count, non-null value count, exact decimal sum,
    min, max. Every field is MERGEABLE (sum of sums, min of mins …),
    which is the algebraic property that lets a warehouse keep a
    rollup current by folding in each new batch's state instead of
    re-scanning history — the aggregate twin of the HWM load above.

    The value sum is exact DECIMAL(28,2): fp addition is non-
    associative, so a float state would drift per merge order; decimal
    state makes merge results independent of batching (the
    finalize_agg_state float division happens ONCE, at read time)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(value_col).alias("n_vals"),
        F.sum(F.col(value_col).cast("decimal(28,2)")).cast("decimal(28,2)").alias("sum_val"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
    )


def merge_agg_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Fold two state frames into one (same schema as agg_state).
    union + one re-aggregate on the key — at scale both sides are
    key-cardinality-sized, orders of magnitude smaller than the fact
    data they summarize."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_vals").alias("n_vals"),
            # cast back so the state schema is CLOSED under merge
            # (Spark widens decimal sums to (38,2); chained merges must
            # not drift the schema). (28,2) holds ~1e26 — no overflow
            # risk from 2-dp telemetry values at any realistic count.
            F.sum("sum_val").cast("decimal(28,2)").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def finalize_agg_state(state: DataFrame) -> DataFrame:
    """Read-time projection of the state into the user-facing rollup
    (count / exact sum as double / min / max / mean). The single float
    step happens here, after all merging — bit-stable regardless of
    how many increments built the state."""
    return state.select(
        *[c for c in state.columns if c not in
          ("n_rows", "n_vals", "sum_val", "min_val", "max_val")],
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("sum_val").cast("double").alias("sum_value"),
        F.col("min_val").alias("min_value"),
        F.col("max_val").alias("max_value"),
        (F.col("sum_val").cast("double") / F.col("n_vals")).alias("avg_value"),
    )
