"""Scale diagnostics — the queries an engineer runs BEFORE picking a
join/agg strategy at 100 TB. The engine ships skew *remedies*
(operators/skew.py salting, AQE skew splitting); this module ships the
*measurement* that decides when to reach for them, as ordinary
hash-checked queries: integer-only statistics, so the evidence is
bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

_N_REDUCERS = 32

_SKEW_SQL = f"""
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT key, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rnk
      FROM per_key
    ), reducers AS (
      SELECT key % {_N_REDUCERS} AS reducer, SUM(cnt) AS rows_in
      FROM per_key GROUP BY key % {_N_REDUCERS}
    )
    SELECT (SELECT COUNT(*) FROM per_key)               AS n_keys,
           (SELECT CAST(SUM(cnt) AS BIGINT) FROM per_key) AS total_rows,
           (SELECT MAX(cnt) FROM per_key)               AS max_key_rows,
           (SELECT key FROM ranked WHERE rnk = 1)       AS hottest_key,
           (SELECT CAST(SUM(cnt) AS BIGINT) FROM ranked WHERE rnk <= 10)
                                                        AS top10_rows,
           (SELECT CAST(MAX(rows_in) AS BIGINT) FROM reducers) AS max_reducer_rows,
           (SELECT COUNT(*) FROM reducers)              AS n_active_reducers
"""


@query("pipeline_key_skew_profile", oracle=_SKEW_SQL)
def pipeline_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for orders.o_custkey — the pre-flight
    check that decides between a plain shuffle join, AQE skew
    splitting, and operators/skew.salted_join: key cardinality, the
    hottest key and its row count, the top-10 keys' combined mass, and
    a modeled 32-reducer placement (key mod N) showing the
    worst reducer's load. All counts are integers — no float anywhere
    — so the profile is hash-exact; the modeled placement uses mod
    (not the engine's internal hash) to stay oracle-portable, which is
    fine because the point is the KEY-mass distribution, not the exact
    reducer assignment.

    Scale shape: one partial→final count per key (the same shuffle the
    real join would do, minus the payload), then three tiny rollups of
    the vocabulary-sized per-key table and a 1-row assembly via
    broadcast scalar joins. Run it on a 100-TB fact table and the
    per-key table is keys-sized, not rows-sized; the decision rule in
    SCALING.md §2 (max reducer share ≥ ~3x mean → salt) reads straight
    off the output columns."""
    per_key = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = per_key.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("key")))
    )
    reducers = per_key.groupBy((F.col("key") % _N_REDUCERS).alias("reducer")).agg(
        F.sum("cnt").alias("rows_in")
    )
    totals = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").alias("max_key_rows"),
    )
    hottest = ranked.filter(F.col("rnk") == 1).select(
        F.col("key").alias("hottest_key")
    )
    top10 = ranked.filter(F.col("rnk") <= 10).agg(
        F.sum("cnt").cast("long").alias("top10_rows")
    )
    red = reducers.agg(
        F.max("rows_in").alias("max_reducer_rows"),
        F.count(F.lit(1)).alias("n_active_reducers"),
    )
    return (
        totals.join(F.broadcast(hottest))
        .join(F.broadcast(top10))
        .join(F.broadcast(red))
        .select(
            "n_keys",
            "total_rows",
            "max_key_rows",
            "hottest_key",
            "top10_rows",
            "max_reducer_rows",
            "n_active_reducers",
        )
    )


# ---------------------------------------------------------------------------
# pipeline_mad_outliers — robust (median/MAD) outlier detection
# ---------------------------------------------------------------------------

# Exact per-group median via positional order statistics (the
# agg_median_exact discipline, relational_deep.py): rank on
# (value, unique id), average the two middle VALUES — one commutative
# IEEE add + one divide, bit-identical in both engines.  The same
# two-order-statistics trick runs twice: once for the median, once for
# the median of absolute deviations.
_MAD_SQL = """
    WITH ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type,
             (MIN(value) + MAX(value)) / 2.0 AS med
      FROM ranked
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.event_id, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ), dev_ranked AS (
      SELECT event_type, event_id, value, med, adev,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY adev, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ), mad AS (
      SELECT event_type,
             (MIN(adev) + MAX(adev)) / 2.0 AS mad
      FROM dev_ranked
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.med, x.mad
    FROM dev d JOIN mad x USING (event_type)
    WHERE d.adev > 3.0 * x.mad
"""


@query("pipeline_mad_outliers", oracle=_MAD_SQL)
def pipeline_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: flag events whose |value − median|
    exceeds 3× the median absolute deviation of their event_type.
    Median/MAD (the classic robust pair) survive the heavy tails that
    wreck mean/stddev z-scores (pipeline_event_zscore is the fragile
    twin this hardens) — a contaminated batch can't drag its own
    threshold.

    Both medians are EXACT positional order statistics (the
    agg_median_exact two-middle-values discipline), so no percentile
    interpolation kernel is involved; every arithmetic step (subtract,
    abs, one add, one divide, compare) is bit-identical IEEE in Spark
    and DuckDB, which is what lets a 3.0×MAD strict-inequality boundary
    hash-certify.

    Plan shape: two window exchanges on event_type (value rank, then
    deviation rank) + two BROADCAST joins of the 5-row median/MAD
    frames back onto events — events itself is scanned once and the
    deviation frame is reused for ranking and for the final filter. At
    100 TB each group sorts in parallel; for one pathological group the
    distributed exact-rank operator (operators/rank.py) is the
    documented upgrade, as with agg_median_exact.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_grp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_grp).alias("n"),
    )
    mid = (F.col("rn") == F.floor((F.col("n") + 1) / 2)) | (
        F.col("rn") == F.floor(F.col("n") / 2) + 1
    )
    med = (
        ranked.filter(mid)
        .groupBy("event_type")
        .agg(((F.min("value") + F.max("value")) / F.lit(2.0)).alias("med"))
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    w_dev = Window.partitionBy("event_type").orderBy("adev", "event_id")
    dev_ranked = dev.select(
        "event_type",
        "adev",
        F.row_number().over(w_dev).alias("rn"),
        F.count(F.lit(1)).over(w_grp).alias("n"),
    )
    mad = (
        dev_ranked.filter(mid)
        .groupBy("event_type")
        .agg(((F.min("adev") + F.max("adev")) / F.lit(2.0)).alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > 3.0 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )
