"""Scan / projection / filter queries (SURVEY.md §2.3, grounding R1, R2,
R5, O1–O3).

These are the queries where *plan shape* is the whole story: every one
must show PushedFilters + a pruned ReadSchema on the parquet scan
(checked in tests/test_plans.py). At 100 TB these run at storage
bandwidth on only the referenced columns — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_events_since, load_table
from . import query

# Mid-range literal over the events table's Jan-2024 span; several
# thousand rows land on each side at every scale factor.
from . import HWM_LITERAL  # re-export (historical home); definition moved to queries/__init__


@query(
    "scan_project_cast",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_quantity AS INTEGER) AS qty_int,
      strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
      l_extendedprice
    FROM lineitem
    """,
)
def scan_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + cast layer — the reference's schema-on-read step
    (weather_task.py:59-67) generalized. Column pruning reaches the scan:
    ReadSchema lists exactly 5 of 11 lineitem columns.

    The date cast is surfaced as an ISO string because Spark DATE and
    DuckDB DATE convert to different host types; the string form is
    representation-stable across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_day"),
        "l_extendedprice",
    )


@query(
    "filter_highwater",
    oracle=f"SELECT * FROM events WHERE ts > TIMESTAMP '{HWM_LITERAL}'",
)
def filter_highwater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's incremental predicate (O1): strict > on event time
    (weather_task.py:82), pushed into the scan.

    Uses load_events_since, which rewrites the predicate onto the raw
    nanos column — filtering the converted µs timestamp would strand the
    predicate above a projection and force a full scan (the plan test
    asserts PushedFilters is non-empty here).
    """
    return load_events_since(spark, sf_dir, HWM_LITERAL)


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_orderstatus = 'F')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND NOT (o_orderpriority LIKE '%SPECIFIED%')
      AND o_orderdate IS NOT NULL
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN + LIKE + null-check in one predicate
    tree; Catalyst folds it into a single pushed filter conjunction.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    ).filter(
        (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") | (F.col("o_orderstatus") == "F"))
        & F.col("o_totalprice").between(50000, 200000)
        & ~F.col("o_orderpriority").like("%SPECIFIED%")
        & F.col("o_orderdate").isNotNull()
    )


@query(
    "project_conditional",
    oracle="""
    SELECT
      event_id,
      CASE
        WHEN value >= 150 THEN 'high'
        WHEN value >= 50 THEN 'mid'
        ELSE 'low'
      END AS value_band,
      COALESCE(NULLIF(event_type, 'view'), '(viewed)') AS type_or_viewed,
      CAST(NULLIF(user_id, 0) AS BIGINT) AS user_id_nz
    FROM events
    """,
)
def project_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bands + coalesce + nullif — the conditional-projection
    surface (SURVEY §2.3). Pure narrow transformation, no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 150, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("(viewed)")).alias(
            "type_or_viewed"
        ),
        F.nullif(F.col("user_id"), F.lit(0)).cast("long").alias("user_id_nz"),
    )
