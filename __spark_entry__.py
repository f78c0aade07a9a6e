"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``projektdataengineering_spark`` (see SURVEY.md
§2.3 for the declared inventory); this file is only the thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from projektdataengineering_spark.queries import load_registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the 5-way region→nation→customer→orders→lineitem join
    composed with a group-aggregate and a per-group top-k window — it
    exercises scan, broadcast + shuffled joins, partial aggregation and a
    ranking window in one plan.
    """
    from projektdataengineering_spark.flagship import flagship

    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    return {name: qd.fn for name, qd in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {
        name: qd.oracle
        for name, qd in load_registry().items()
        if qd.oracle is not None
    }
