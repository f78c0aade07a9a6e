"""Flagship end-to-end query for the driver's smoke check.

Revenue by region/nation for orders shipped in a window, with each
nation's top-3 customers by revenue attached via a ranking window —
a 5-way join (two broadcast, two shuffled) + aggregate + window in one
Catalyst plan. Generalizes the reference's whole pipeline shape
(scan → transform → materialize; weather_task.py:129-147) into the kind
of query its warehouse could never serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions import revenue_expr


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # region/nation are fixed-cardinality → always broadcast; the
    # customer⋈orders⋈lineitem chain shuffles on its keys and AQE picks
    # broadcast for customer when the filtered side is small enough.
    enriched = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    )

    per_customer = enriched.groupBy("r_name", "n_name", "c_custkey").agg(
        F.sum(revenue_expr()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )

    w = Window.partitionBy("r_name", "n_name").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    )
    return (
        per_customer.withColumn("rank_in_nation", F.row_number().over(w))
        .where(F.col("rank_in_nation") <= 3)
        .orderBy("r_name", "n_name", "rank_in_nation")
    )
