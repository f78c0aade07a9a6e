"""As-of join — an operator PySpark lacks natively (SURVEY.md §4.2 item 1).

Implementation is the union+window trick, pure DataFrame ops:

1. tag left rows 1, right rows 0, union them on (key, ts, payload);
2. window per key ordered by (ts, tag) — right rows sort before left
   rows at equal timestamps, which gives *inclusive* at-or-before
   semantics (same as ``pd.merge_asof`` / DuckDB ``ASOF JOIN`` with
   ``<=``);
3. ``last(<struct of ALL right payload columns>, ignoreNulls=True)``
   over the unbounded-preceding frame carries the most recent right
   ROW forward — a single struct, built only on right rows, so the
   carry is row-atomic: a NULL payload *field* on the matched right
   row propagates as NULL (the struct itself is never null on a right
   row), and multi-column payloads can never mix values from
   different right rows;
4. keep only left rows and unpack the struct.

Scale rationale: the naive formulation (non-equi join + row_number) is
a per-key cross product — O(n·m) within every key, catastrophic on a
hot key. This plan is one shuffle on the key + one sort per partition,
O((n+m) log(n+m)) per partition, and AQE's skew handling applies to the
single exchange. This is the same strategy a native ASOF operator would
pick (sort-merge), expressed in stock operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: dict[str, str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` and the same ``on`` key.

    ``right_payload`` maps right column → output alias; defaults to
    ``{right_ts: f"asof_{right_ts}"}`` (just the matched timestamp).
    Left rows with no earlier right row keep NULL payload (left-outer
    as-of semantics).
    """
    if right_payload is None:
        right_payload = {right_ts: f"asof_{right_ts}"}

    left_cols = left.columns
    payload_aliases = list(right_payload.values())
    payload_type = T.StructType(
        [T.StructField(dst, right.schema[src].dataType) for src, dst in right_payload.items()]
    )

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(payload_type).alias("__rpay"),
    )
    # The payload struct exists ONLY on right rows and is never null
    # there (a struct of null fields is still a non-null struct), so
    # last(ignorenulls) below skips left rows and carries the matched
    # right row as one atomic value.
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(src).alias(dst) for src, dst in right_payload.items()]).alias("__rpay"),
    )

    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last("__rpay", ignorenulls=True).over(w).alias("__carry")
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"__carry.{a}").alias(a) for a in payload_aliases],
    )
