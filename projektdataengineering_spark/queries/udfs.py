"""UDF/UDAF/UDTF surface (SURVEY.md §2.3 "UDF surface").

Policy (the whole point of this module): Python enters the plan ONLY via
Arrow-vectorized interfaces — ``pandas_udf`` for scalar, ``applyInPandas``
for grouped aggregation — never row-at-a-time UDFs. The UDTF case is
deliberately implemented WITHOUT Python at all (explode of a built-in
map construction): if a built-in can express the expansion, the UDF tier
is the wrong tier.

Scale notes: a pandas_udf ships Arrow batches to one Python worker per
core — ~10-100× the throughput of pickled row UDFs, but still an order
slower than codegen'd JVM expressions, which is why each docstring names
the built-in equivalent (the oracle states it in SQL).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _severity_score_udf():
    # Defined lazily: pandas_udf parses its DDL return type against the
    # active session, so a module-level definition would require Spark
    # at import time (the registry must import session-free).
    @F.pandas_udf("double")
    def _severity_score(value: pd.Series, type_len: pd.Series) -> pd.Series:
        # Reproducible float arithmetic only (no rounding, no
        # data-dependent order): bit-identical to value*2 + type_len.
        return value * 2.0 + type_len

    return _severity_score


@query(
    "udf_scalar",
    oracle="""
    SELECT event_id,
           value * 2.0 + length(event_type) AS severity_score
    FROM events
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF scoring events; the oracle is the
    equivalent pure-SQL expression, proving the UDF boundary doesn't
    change semantics. (In production this slot is for logic SQL can't
    express — tokenizers, model featurizers.)"""
    ev = load_table(spark, sf_dir, "events")
    score = _severity_score_udf()
    return ev.select(
        "event_id",
        score(F.col("value"), F.length("event_type").cast("double")).alias("severity_score"),
    )


def _group_median(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "median_value": [pdf["value"].median()],
            "n_events": [len(pdf)],
        }
    )


@query(
    "udaf_grouped",
    oracle="""
    SELECT event_type,
           median(value) AS median_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pandas UDAF: per-type exact median via applyInPandas.
    Median is the canonical "needs full group in memory" aggregate —
    the honest cost is one shuffle + whole-group materialization per
    key; at 100 TB prefer percentile_approx unless exactness is
    required (both engines average the middle pair on even counts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_group_median, schema="event_type string, median_value double, n_events long")
    )


@query(
    "udtf_explode_like",
    oracle="""
    SELECT event_id,
           k AS prop_key,
           CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS prop_value
    FROM (
      SELECT event_id, props, unnest(json_keys(props)) AS k
      FROM events
    )
    """,
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row→many expansion of the props JSON object into (key, value)
    rows. Implemented with from_json(map) + explode — no Python: a
    built-in generator beats a UDTF whenever the expansion is
    expressible, keeping the whole plan in codegen."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,bigint>")).alias("prop_key", "prop_value"),
    )
