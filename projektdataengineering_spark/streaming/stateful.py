"""Custom stateful streaming operator via applyInPandasWithState —
the engine's pattern for semantics Structured Streaming's built-in
windows can't express.

The operator here is *stateful cross-batch dedup with first-wins
semantics*: emit each key's FIRST-seen row, remember seen keys, drop
every later duplicate (optionally with a state TTL so the key set
doesn't grow unboundedly). This is the streaming form of the batch
``dedup_incremental`` anti-join (operators/incremental.py O4 fix):
instead of re-joining each batch against an ever-growing warehouse,
the "existing keys" side lives in Spark's keyed state store.

Scale notes: state is partitioned by key across executors exactly like
a shuffle — no single-node key set. State size is bounded by the TTL
(processing-time here, to keep the operator deterministic under replay
give keys an event-time watermark instead). Arrow batches flow per key
group; the per-group pandas work is O(rows in batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Output/state schemas for the dedup operator over (key, ts, payload).
DEDUP_OUTPUT_SCHEMA = "key string, first_ts timestamp, n_dropped long"
DEDUP_STATE_SCHEMA = "seen boolean, first_ts timestamp, n_dropped long"


def _dedup_first_wins(key, pdf_iter, state: GroupState):
    """Emit the first-ever row per key; afterwards only count drops.

    State: (seen, first_ts, n_dropped). Emits one row when the key is
    first seen, and an updated drop-count row whenever later duplicates
    arrive (so the sink can track suppression volume).
    """
    n_new = 0
    first_ts = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        batch_min = pdf["ts"].min()
        first_ts = batch_min if first_ts is None else min(first_ts, batch_min)
        n_new += len(pdf)
    if n_new == 0:
        return iter(())

    if state.exists:
        seen, prev_first, dropped = state.get
        state.update((True, prev_first, dropped + n_new))
        out = pd.DataFrame(
            {"key": [key[0]], "first_ts": [prev_first], "n_dropped": [dropped + n_new]}
        )
    else:
        state.update((True, first_ts, n_new - 1))
        out = pd.DataFrame(
            {"key": [key[0]], "first_ts": [first_ts], "n_dropped": [n_new - 1]}
        )
    return iter((out,))


def dedup_stream_first_wins(keyed: DataFrame) -> DataFrame:
    """Apply the stateful first-wins dedup to a streaming DataFrame with
    columns (key string, ts timestamp, ...). Output mode: update."""
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_first_wins,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
