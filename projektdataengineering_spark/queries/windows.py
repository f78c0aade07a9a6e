"""Sort / top-k / window-function queries (SURVEY.md §2.3 "Windows,
sort, top-k"; grounding S1–S3 — the serving client's three ORDER BY
queries — generalized to the full analytic-window surface).

Scale notes: `orderBy().limit(k)` compiles to TakeOrderedAndProject —
each task keeps a k-row heap, the driver merges; no global sort ever
materializes (this is how the reference's LIMIT-200 serving queries stay
cheap at 100 TB). Partitioned windows shuffle once on the partition key
and sort within partitions; the ranking/frame functions then run
streaming over the sorted runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import SQL_DSUM, dsum, money
from . import query


@query(
    "sort_limit_asc",
    oracle="SELECT * FROM events ORDER BY ts ASC, event_id ASC LIMIT 200",
)
def sort_limit_asc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 verbatim (SELECT * ... ORDER BY ts ASC LIMIT 200,
    MLapp IL dump) with the unique event_id tiebreaker the reference's
    serving queries lack. TakeOrderedAndProject: no global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy(F.col("ts").asc(), F.col("event_id").asc()).limit(200)


@query(
    "sort_limit_desc",
    oracle="SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 200",
)
def sort_limit_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 verbatim (descending page)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(200)


@query(
    "topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rk
      FROM orders
    ) t
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per customer — the canonical top-k-per-
    group window. One shuffle on the partition key; the row_number filter
    runs during the per-partition sort, never materializing full groups.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over totalprice per status."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(ts) OVER w AS prev_ts,
           LEAD(ts) OVER w AS next_ts,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next event timestamps + µs delta (lag/lead)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (us - F.lag(us).over(w)).cast("long").alias("us_since_prev"),
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer ordered by date (rowsBetween frame).
    Decimal-exact summand keeps the running values bit-stable."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(money("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_value
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing sum per user — a RANGE frame over epoch
    microseconds (604800000000 µs = 7 days). Range frames need a numeric
    order key in Spark, so both sides order by epoch_us."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-604_800_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(money("value")).over(w).cast("double").alias("trailing_7d_value"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           first_value(o_totalprice) OVER w AS cheapest_in_status,
           last_value(o_totalprice) OVER w AS priciest_in_status,
           nth_value(o_totalprice, 2) OVER w AS second_cheapest
    FROM orders
    WINDOW w AS (
      PARTITION BY o_orderstatus
      ORDER BY o_totalprice, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an explicit full-partition ROWS frame —
    the frame matters: the default frame for last_value would be
    up-to-current-row (i.e. each row's own value). Unique o_orderkey
    tiebreaker keeps both engines' orderings identical."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("cheapest_in_status"),
        F.last("o_totalprice").over(w).alias("priciest_in_status"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_cheapest"),
    )


@query(
    "window_percentiles",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(10) OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
    """,
)
def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position analytics: percent_rank/cume_dist ordered
    by value alone (ties share positions — both engines agree), decile
    via ntile with a unique tiebreaker (ntile assigns by ROW, so without
    the tiebreaker tied rows could land in different tiles per engine).
    The doubles are exact integer ratios — bit-identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    wt = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(wt).cast("long").alias("decile"),
    )
