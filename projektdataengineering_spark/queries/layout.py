"""Data-layout operators — multi-dimensional clustering (Z-order) for
scan pruning.

At 100 TB the cheapest query is the one that never reads the file: a
table laid out in Z-order (Morton order) over two frequent filter
dimensions gives every file a TIGHT min/max envelope in BOTH
dimensions at once, so parquet footer stats / catalog file stats prune
on either predicate — the property a single-column sort only provides
for its leading key. This module implements the Morton curve with
plain JVM-side bit arithmetic (no UDF anywhere) and exposes the layout
decision as an ordinary hash-checked query: rank-normalize each
dimension to a 16-bit code, interleave the bits into a 32-bit z-value,
NTILE the curve into files ("buckets"), and report each file's
per-dimension envelope. A correctness hash over that report pins the
entire layout — codes, curve, file assignment, and envelopes — to the
oracle's independent recomputation.

The layout win is ASSERTED, not eyeballed: tests/test_operators.py
checks that the average per-file envelope fraction of each dimension
is a small fraction of what the same file count gives under the
naive single-dim sort for the trailing dimension (which degrades to
~the full range per file).

Reference: the reference engine has no layout control at all (its
sink is a plain JDBC append — spark_tasks/weather_task.py:95-99);
this is north-star scale work, same family as sources.write_bucketed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

_BITS = 16
_N_FILES = 64


def _spark_interleave(xcol: str, ycol: str):
    """z = Σ_i ((x>>i)&1)<<2i  |  ((y>>i)&1)<<(2i+1) — pure column
    arithmetic, whole-stage-codegen'd, no UDF."""
    terms = []
    for i in range(_BITS):
        terms.append(
            F.shiftleft(F.shiftright(F.col(xcol), i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(F.col(ycol), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms)


def _sql_interleave(xcol: str, ycol: str) -> str:
    terms = []
    for i in range(_BITS):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# Rank-normalized 16-bit codes: (rank-1) spread uniformly over the
# code space. Integer arithmetic only — ((rank-1) * 65536) / n  with
# BIGINT division — so there is no float in the whole pipeline and
# the oracle hash can't ulp-flake.
_ZORDER_SQL = f"""
    WITH coded AS (
      SELECT event_id, user_id, value,
             ((RANK() OVER (ORDER BY user_id) - 1) * {1 << _BITS}) // COUNT(*) OVER ()
               AS xcode,
             ((RANK() OVER (ORDER BY value, event_id) - 1) * {1 << _BITS}) // COUNT(*) OVER ()
               AS ycode
      FROM events
    ), curved AS (
      SELECT *, {_sql_interleave("xcode", "ycode")} AS zvalue FROM coded
    ), filed AS (
      SELECT *, NTILE({_N_FILES}) OVER (ORDER BY zvalue, event_id) AS file_id
      FROM curved
    )
    SELECT CAST(file_id AS INT) AS file_id,
           COUNT(*) AS n_rows,
           MIN(user_id) AS min_user, MAX(user_id) AS max_user,
           MIN(value) AS min_value, MAX(value) AS max_value,
           MIN(zvalue) AS z_lo, MAX(zvalue) AS z_hi
    FROM filed GROUP BY file_id
"""


@query("pipeline_zorder_layout", oracle=_ZORDER_SQL)
def pipeline_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout plan for events over (user_id, value): the
    64-file manifest a Morton-clustered rewrite would produce, with
    each file's envelope in both dimensions. RANK-based 16-bit codes
    (integer math end-to-end), JVM-side bit interleave, NTILE file
    assignment with event_id tiebreak — every step deterministic and
    recomputed independently by the DuckDB oracle.

    Scale shape: two single-exchange ranks + one curve sort — at
    100 TB the NTILE becomes `repartitionByRange(zvalue)` +
    `sortWithinPartitions` + write (same curve, no global window), and
    the rank normalization becomes approx-quantile code boundaries
    computed once per rewrite; both keep the plan at O(n log n) with
    NO driver materialization. The envelope report is what the file
    catalog stores for pruning."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # `div` = integer division on BIGINT in BOTH Spark SQL and the
    # oracle's `//` — no float anywhere, so no ulp risk in the codes
    coded = e.selectExpr(
        "event_id",
        "user_id",
        "value",
        # CAST the rank to BIGINT before the multiply: Spark's RANK()
        # is INT and ANSI mode faults (rank-1)*65536 past ~32k rows
        f"((CAST(RANK() OVER (ORDER BY user_id) AS BIGINT) - 1) * {1 << _BITS})"
        " div (COUNT(*) OVER ()) AS xcode",
        f"((CAST(RANK() OVER (ORDER BY value, event_id) AS BIGINT) - 1) * {1 << _BITS})"
        " div (COUNT(*) OVER ()) AS ycode",
    )
    curved = coded.withColumn("zvalue", _spark_interleave("xcode", "ycode"))
    filed = curved.withColumn(
        "file_id", F.ntile(_N_FILES).over(Window.orderBy("zvalue", "event_id"))
    )
    return filed.groupBy(F.col("file_id").cast("int").alias("file_id")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min("zvalue").alias("z_lo"),
        F.max("zvalue").alias("z_hi"),
    )
