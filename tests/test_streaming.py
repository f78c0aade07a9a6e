"""Streaming-mode mirrors: the SAME transformation functions used by the
batch registry queries are driven under readStream (bounded file source,
availableNow trigger, memory sink) and must agree with their batch
results — the unified-API guarantee the streaming module is built on.
"""

from __future__ import annotations

from projektdataengineering_spark.catalog import load_table
from projektdataengineering_spark.streaming import (
    open_event_stream,
    run_to_memory_sink,
    session_windows,
    sliding_avg,
    tumbling_counts,
)


def _canon(df):
    return sorted(map(tuple, (tuple(r) for r in df.collect())))


def test_stream_tumbling_matches_batch(spark, sf_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = tumbling_counts(open_event_stream(spark, sf_dir))
    run_to_memory_sink(stream, "tumbling_out", output_mode="complete")
    assert _canon(spark.table("tumbling_out")) == _canon(batch)


def test_stream_sliding_matches_batch(spark, sf_dir):
    batch = sliding_avg(load_table(spark, sf_dir, "events"))
    stream = sliding_avg(open_event_stream(spark, sf_dir))
    run_to_memory_sink(stream, "sliding_out", output_mode="complete")
    assert _canon(spark.table("sliding_out")) == _canon(batch)


def test_stream_session_windows_with_watermark(spark, sf_dir):
    """Session windows under a watermark (append mode): every finalized
    streaming session must be a batch session — the watermark may hold
    back only the most recent (non-finalized) windows."""
    batch = set(_canon(session_windows(load_table(spark, sf_dir, "events"))))
    stream = session_windows(
        open_event_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    )
    run_to_memory_sink(stream, "session_out", output_mode="append")
    emitted = set(_canon(spark.table("session_out")))
    assert emitted, "watermarked session stream emitted nothing"
    assert emitted <= batch, "streaming emitted a session batch mode doesn't have"
