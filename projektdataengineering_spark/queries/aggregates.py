"""Aggregation queries (SURVEY.md §2.3 "Aggregation").

Grounding: generalizes the reference's only two aggregates — the
hand-pushed-down scalar MAX for the incremental high-water mark
(/root/reference/spark_tasks/weather_task.py:72-76) and the row-count gate
(weather_task.py:93) — into the full group-by/rollup/cube/pivot surface.

Scale notes: all of these are single-shuffle hash aggregates with map-side
partial aggregation (Spark plans HashAggregate(partial) → Exchange →
HashAggregate(final)); none collect to the driver. Cardinality of every
grouping key here is tiny relative to input (flags, statuses), so the
shuffle moves only partial-agg state, not data — exactly the plan shape
you want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import SQL_DAVG, SQL_DSUM, SQL_REVENUE, davg, dsum, money, revenue_expr
from . import query

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {SQL_DSUM.format(x="l_quantity")} AS sum_qty,
  {SQL_DSUM.format(x="l_extendedprice")} AS sum_base_price,
  CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(({SQL_REVENUE}) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  {SQL_DAVG.format(x="l_quantity")} AS avg_qty,
  {SQL_DAVG.format(x="l_extendedprice")} AS avg_price,
  {SQL_DAVG.format(x="l_discount")} AS avg_disc,
  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_groupby_multi", oracle=_Q1_ORACLE)
def agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→group→8 aggregates.

    The flagship aggregate. Filter + column pruning push into the parquet
    scan; the 6-group output means the exchange after partial aggregation
    carries ~6 rows per map task regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = revenue_expr()
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(rev).cast("double").alias("sum_disc_price"),
            F.sum(rev * (F.lit(1) + money("l_tax"))).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_scalar_max",
    oracle="SELECT CAST(MAX(ts) AS TIMESTAMP) AS max_ts FROM events",
)
def agg_scalar_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global MAX(ts) — exactly the reference's high-water-mark lookup.

    The reference pushes this into Postgres by hand-writing a subquery as
    the JDBC table (weather_task.py:72-76). Engine-native form: a scalar
    aggregate over the columnar source — parquet min/max footer stats make
    this a metadata-mostly scan, and the single-row result is the only
    thing that ever reaches the driver.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.max("ts").alias("max_ts"))
