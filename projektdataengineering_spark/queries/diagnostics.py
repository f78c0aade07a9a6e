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
