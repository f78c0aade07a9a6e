"""SQL entry point: the reference's serving client speaks raw SQL
(SURVEY §3.3, S1–S3); this engine serves the same queries through
spark.sql over the registered views, and SQL and DataFrame plans must
produce identical results (same Catalyst plan underneath).
"""

from __future__ import annotations

from projektdataengineering_spark.catalog import register_views
from projektdataengineering_spark.queries import load_registry

REGISTRY = load_registry()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_serving_queries_via_sql_match_dataframe(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_asc = spark.sql(
        "SELECT * FROM events ORDER BY ts ASC, event_id ASC LIMIT 200"
    )
    assert _rows(sql_asc) == _rows(REGISTRY["sort_limit_asc"].fn(spark, sf_dir))

    sql_desc = spark.sql(
        "SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 200"
    )
    assert _rows(sql_desc) == _rows(REGISTRY["sort_limit_desc"].fn(spark, sf_dir))


def test_aggregate_via_sql_matches_dataframe(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    from pyspark.sql import functions as F

    from projektdataengineering_spark.catalog import load_table
    from projektdataengineering_spark.functions import dsum

    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )
    assert _rows(sql) == _rows(df)
