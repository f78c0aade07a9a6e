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


def test_custdist_preserves_zero_order_customers(spark, sf_dir):
    """Q13's defining semantics: the c_count=0 bucket must EXIST and
    the distribution must conserve mass. The driver oracle proves
    Spark ≡ DuckDB but both engines would agree equally well on a
    WHERE-clause formulation that silently drops unmatched customers —
    this pins the preserved-null behavior itself against the base
    tables."""
    from pyspark.sql import functions as F

    from projektdataengineering_spark.catalog import load_table
    from projektdataengineering_spark.queries.relational_deep import (
        agg_custdist_outer,
    )

    rows = {r["c_count"]: r["custdist"] for r in
            agg_custdist_outer(spark, sf_dir).collect()}
    n_cust = load_table(spark, sf_dir, "customer").count()
    n_qual = (
        load_table(spark, sf_dir, "orders")
        .filter(~F.col("o_orderpriority").like("%URGENT%"))
        .count()
    )
    assert sum(rows.values()) == n_cust, "every customer exactly once"
    assert sum(c * d for c, d in rows.items()) == n_qual, (
        "counts must conserve the qualifying-order mass"
    )
    # the sf0.01 fixture has exactly one all-URGENT customer — the row
    # a WHERE-clause (join-dropping) formulation would lose
    if sf_dir.rstrip("/").endswith("sf0.01"):
        assert rows.get(0) == 1, rows.get(0)


def test_disjunctive_pushdown_reaches_both_scans(spark, sf_dir):
    """Q19's point is the optimizer work: each scan must receive its
    DERIVED single-table disjunction (CNF extraction), not just the
    shared conjunct — otherwise the shape silently degrades to a
    filter-after-join plan that reads both tables in full."""
    from projektdataengineering_spark.queries.relational_deep import (
        join_disjunctive_pushdown,
    )

    from projektdataengineering_spark.plans import explain_string

    df = join_disjunctive_pushdown(spark, sf_dir)
    plan = explain_string(df)  # formatted mode: untruncated PushedFilters
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    li_push = next((p for p in pushed if "l_quantity" in p), "")
    p_push = next((p for p in pushed if "p_brand" in p), "")
    assert "Or(" in li_push and "l_linestatus" in li_push, li_push
    assert "Or(" in p_push and "p_size" in p_push, p_push
