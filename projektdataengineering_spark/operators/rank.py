"""Distributed exact global ranking — `row_number() OVER (ORDER BY …)`
without the single-partition sort.

A bare global window (`Window.orderBy(...)` with no partitionBy) moves
the ENTIRE dataset to one task — Spark even warns (`WindowExec: No
Partition Defined`). That is the one plan shape guaranteed not to
survive a 100-TB input. The scalable form is the classic two-phase
rank:

1. `repartitionByRange` on the sort key — a range exchange (sampled
   boundaries, the same machinery `orderBy` itself uses) puts each row
   in a partition whose key range is strictly ordered across partition
   ids, with the SORT spread over all tasks;
2. a per-partition `row_number` (bounded local sort, no data movement);
3. per-partition row counts — at most `num_partitions` rows — turned
   into starting offsets by a prefix sum over that TINY frame, then
   broadcast-joined back: `global_rank = offset[pid] + local_rank`.

The partition-id column is materialized AFTER the range exchange via
`spark_partition_id()`; the frame is `localCheckpoint`ed so the counts
branch and the join branch see ONE materialization (nondeterministic
pid must not be recomputed under a possibly re-sampled range exchange;
at warehouse scale this would be a persisted intermediate instead).

Cost: one full range shuffle + one broadcast hash join — vs the global
window's one range shuffle INTO ONE TASK. Used by
`pipeline_price_deciles` (queries/pipeline_ops.py), where the exact
NTILE decile is rebuilt from this rank with integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_LRN = "__gr_local_rn"
_OFS = "__gr_offset"


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` = the exact 1-based global row number under
    ``ORDER BY order_cols`` (which must end in a unique tiebreaker for
    a total order), computed with NO single-partition stage."""
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    local = (
        part.withColumn(_PID, F.spark_partition_id())
        .withColumn(
            _LRN,
            F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols)),
        )
        .localCheckpoint(eager=False)
    )
    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("__gr_cnt"))
    offsets = counts.select(
        _PID,
        F.coalesce(
            F.sum("__gr_cnt").over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias(_OFS),
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFS) + F.col(_LRN)).cast("long"))
        .drop(_PID, _LRN, _OFS)
    )


def exact_ntile(rank: F.Column, total: F.Column, k: int) -> F.Column:
    """Rebuild SQL ``NTILE(k)`` from a 1-based global rank and the total
    row count, as a pure integer expression (no window): the first
    ``total % k`` buckets get ``total/k + 1`` rows, the rest ``total/k``
    — exactly Spark's and DuckDB's NTILE contract."""
    q = (total / k).cast("long")
    rem = total % k
    big = rem * (q + 1)  # rows living in the (q+1)-sized leading buckets
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(rem + ((rank - big - 1) / F.greatest(q, F.lit(1))).cast("long") + 1)
        .cast("long")
    )
