"""Set-operation queries (SURVEY.md §2.3 "Set operations").

Halves are split on key parity — deterministic, partition-local
predicates (no shuffle to form the inputs). UNION ALL is a zero-shuffle
concatenation of scans; DISTINCT/INTERSECT/EXCEPT each hash-shuffle once
on the full row — at 100 TB, run them on pruned key columns (as these
queries do), never on wide rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _order_halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 2 == 0),
        o.filter(F.col("o_orderkey") % 2 == 1),
    )


@query(
    "set_union_all",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, 'even' AS half
    FROM lineitem WHERE l_orderkey % 2 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity, 'odd' AS half
    FROM lineitem WHERE l_orderkey % 2 = 1
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split lineitem by orderkey parity and recombine with unionByName
    (position-independent, schema-checked — safer than positional union)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select("l_orderkey", "l_linenumber", "l_quantity")
    even = base.filter(F.col("l_orderkey") % 2 == 0).withColumn("half", F.lit("even"))
    odd = base.filter(F.col("l_orderkey") % 2 == 1).withColumn("half", F.lit("odd"))
    return even.unionByName(odd)


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
    UNION
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics over the two halves' customer keys."""
    even, odd = _order_halves(spark, sf_dir)
    return even.select("o_custkey").union(odd.select("o_custkey")).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers appearing in both halves (INTERSECT DISTINCT)."""
    even, odd = _order_halves(spark, sf_dir)
    return even.select("o_custkey").intersect(odd.select("o_custkey"))


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers only in the even half (EXCEPT DISTINCT = subtract)."""
    even, odd = _order_halves(spark, sf_dir)
    return even.select("o_custkey").subtract(odd.select("o_custkey"))


@query(
    "unpivot_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of three lineitem measures — the inverse
    of agg_pivot. Spark's unpivot is a Generate (map-side row expansion,
    no shuffle); the oracle spells it as UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_discount", "discount")
        .otherwise("tax"),
    )
