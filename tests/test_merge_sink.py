"""Idempotent MERGE-sink proofs: replaying a batch must be a no-op,
upserts must converge, and the partitioned path must only rewrite the
partitions the batch touches (round-3 verdict #5)."""

from __future__ import annotations

import os

import pytest

from projektdataengineering_spark.sources.merge_sink import (
    append_once,
    foreach_batch_upsert,
    merge_upsert,
)


def _rows(spark, path):
    # pin column order: a partitioned read surfaces the partition col last
    df = spark.read.parquet(path).select("k", "part", "ts", "v")
    return sorted(map(tuple, df.collect()))


def _mk(spark, data):
    return spark.createDataFrame(data, "k long, part string, ts long, v string")


BASE = [(1, "a", 10, "one"), (2, "a", 10, "two"), (3, "b", 10, "three")]


def test_append_once_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "wh")
    batch = _mk(spark, BASE)
    assert append_once(spark, batch, path, ["k"]) == 3
    once = _rows(spark, path)
    # replay: identical batch writes 0 rows, table unchanged (hash-equal)
    assert append_once(spark, batch, path, ["k"]) == 0
    assert _rows(spark, path) == once
    # a mixed batch appends ONLY the genuinely new key
    nxt = _mk(spark, [(2, "a", 99, "dup"), (4, "b", 11, "four")])
    assert append_once(spark, nxt, path, ["k"]) == 1
    assert (1, "a", 10, "one") in _rows(spark, path)
    assert (4, "b", 11, "four") in _rows(spark, path)
    assert (2, "a", 99, "dup") not in _rows(spark, path)


def test_merge_upsert_converges_and_replays_clean(spark, tmp_path):
    path = str(tmp_path / "wh")
    merge_upsert(spark, _mk(spark, BASE), path, ["k"], "ts")
    first = _rows(spark, path)
    assert len(first) == 3

    # update k=2, insert k=4; k=1/3 must survive untouched
    upd = _mk(spark, [(2, "a", 20, "two-v2"), (4, "b", 20, "four")])
    merge_upsert(spark, upd, path, ["k"], "ts")
    after = _rows(spark, path)
    assert (2, "a", 20, "two-v2") in after and (4, "b", 20, "four") in after
    assert (1, "a", 10, "one") in after and (3, "b", 10, "three") in after
    assert len(after) == 4

    # REPLAY the same batch: table must be hash-identical
    merge_upsert(spark, upd, path, ["k"], "ts")
    assert _rows(spark, path) == after

    # in-batch duplicate keys: highest order_col wins deterministically
    dup = _mk(spark, [(5, "c", 1, "old"), (5, "c", 2, "new")])
    merge_upsert(spark, dup, path, ["k"], "ts")
    assert (5, "c", 2, "new") in _rows(spark, path)
    assert (5, "c", 1, "old") not in _rows(spark, path)


def test_merge_upsert_partitioned_rewrites_only_touched(spark, tmp_path):
    path = str(tmp_path / "wh")
    merge_upsert(spark, _mk(spark, BASE), path, ["k"], "ts", partition_col="part")
    # fingerprint the untouched partition's files (names + mtimes)
    part_b = os.path.join(path, "part=b")
    before = sorted(
        (f, os.path.getmtime(os.path.join(part_b, f)))
        for f in os.listdir(part_b)
        if f.endswith(".parquet")
    )
    upd = _mk(spark, [(2, "a", 20, "two-v2")])
    merge_upsert(spark, upd, path, ["k"], "ts", partition_col="part")
    after = sorted(
        (f, os.path.getmtime(os.path.join(part_b, f)))
        for f in os.listdir(part_b)
        if f.endswith(".parquet")
    )
    assert before == after  # partition b: same files, never rewritten
    rows = _rows(spark, path)
    assert (2, "a", 20, "two-v2") in rows and len(rows) == 3
    # replay converges here too
    merge_upsert(spark, upd, path, ["k"], "ts", partition_col="part")
    assert _rows(spark, path) == rows


def test_foreach_batch_upsert_replayed_microbatch(spark, tmp_path):
    """Simulate checkpoint-recovery redelivery: applying the same
    micro-batch function twice must leave the sink hash-identical."""
    path = str(tmp_path / "wh")
    apply = foreach_batch_upsert(path, ["k"], "ts")
    b0 = _mk(spark, BASE)
    apply(b0, 0)
    b1 = _mk(spark, [(2, "a", 20, "two-v2"), (4, "b", 20, "four")])
    apply(b1, 1)
    want = _rows(spark, path)
    apply(b1, 1)  # redelivery of batch 1
    assert _rows(spark, path) == want
    assert (2, "a", 20, "two-v2") in want and len(want) == 4


def test_corrupt_existing_table_raises_not_overwrites(spark, tmp_path):
    """A read failure on an EXISTING path must propagate — it must NOT
    be mistaken for first-run bootstrap, which would replace the whole
    warehouse with the current batch (silent data loss)."""
    path = str(tmp_path / "wh")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "w") as fh:
        fh.write("this is not parquet")
    batch = _mk(spark, BASE)
    with pytest.raises(Exception):
        merge_upsert(spark, batch, path, ["k"], "ts")
    # the corrupt-but-existing table was left alone, not overwritten
    with open(os.path.join(path, "part-00000.parquet")) as fh:
        assert fh.read() == "this is not parquet"


def test_partitioned_upsert_with_hive_escaped_values(spark, tmp_path):
    """Partition values containing characters the writer Hive-escapes
    ('=', ':', '%', ' ') must still swap correctly — the installed
    directory names come from the staging listing, never from
    hand-built f"{col}={value}" strings that would miss the escaped
    names and silently discard the batch."""
    path = str(tmp_path / "wh")
    data = [
        (1, "a=b", 10, "one"),
        (2, "x:y %", 10, "two"),
        (3, "plain", 10, "three"),
    ]
    merge_upsert(spark, _mk(spark, data), path, ["k"], "ts", partition_col="part")
    assert _rows(spark, path) == sorted(map(tuple, data))
    # upsert into one weird partition: k=1 updated, others untouched
    upd = [(1, "a=b", 20, "ONE"), (4, "a=b", 20, "four")]
    merge_upsert(spark, _mk(spark, upd), path, ["k"], "ts", partition_col="part")
    assert _rows(spark, path) == sorted(
        map(tuple, upd + [(2, "x:y %", 10, "two"), (3, "plain", 10, "three")])
    )


def test_partitioned_upsert_null_partition_survivors(spark, tmp_path):
    """Existing rows in the NULL partition (__HIVE_DEFAULT_PARTITION__)
    whose keys are absent from the batch must survive an upsert that
    touches the NULL partition — isin() alone never matches NULL."""
    path = str(tmp_path / "wh")
    data = [(1, None, 10, "one"), (2, None, 10, "two"), (3, "b", 10, "three")]
    merge_upsert(spark, _mk(spark, data), path, ["k"], "ts", partition_col="part")
    upd = [(1, None, 20, "ONE")]
    merge_upsert(spark, _mk(spark, upd), path, ["k"], "ts", partition_col="part")
    assert _rows(spark, path) == sorted(
        map(tuple, [(1, None, 20, "ONE"), (2, None, 10, "two"), (3, "b", 10, "three")])
    )


def test_partitioned_swap_failure_rolls_back_completely(spark, tmp_path, monkeypatch):
    """A rename failure mid-swap must restore the COMPLETE pre-merge
    table — including partitions whose new data was already installed
    before the failure (round-5 ADVICE: the old rollback left those at
    the NEW contents, so readers could see a mixed pre/post table).
    Injected via the merge_sink._rename seam: every install after the
    first one fails, across several multi-partition layouts."""
    from projektdataengineering_spark.sources import merge_sink

    path = str(tmp_path / "wh")
    base = [(1, "a", 10, "one"), (2, "b", 10, "two"), (3, "c", 10, "three")]
    merge_upsert(spark, _mk(spark, base), path, ["k"], "ts", partition_col="part")
    before = _rows(spark, path)

    real_rename = merge_sink._rename

    def failing_rename(fs, src, dst, _n=[0]):
        # retire+install per partition → calls 1-2 = partition one OK;
        # fail the SECOND partition's install (call 4), after partition
        # one is fully swapped in
        _n[0] += 1
        if _n[0] == 4:
            return False
        return real_rename(fs, src, dst)

    monkeypatch.setattr(merge_sink, "_rename", failing_rename)
    upd = [(1, "a", 20, "ONE"), (2, "b", 20, "TWO"), (3, "c", 20, "THREE")]
    with pytest.raises(IOError):
        merge_upsert(spark, _mk(spark, upd), path, ["k"], "ts", partition_col="part")
    monkeypatch.setattr(merge_sink, "_rename", real_rename)

    # complete pre-merge table — no partition holds the new batch
    assert _rows(spark, path) == before
    # staging and trash are cleaned up — nothing accumulates
    parent = os.path.dirname(path)
    leftovers = [d for d in os.listdir(parent)
                 if "__staging_" in d or "__old_" in d]
    assert leftovers == []
    # and the merge still works once the fault clears
    merge_upsert(spark, _mk(spark, upd), path, ["k"], "ts", partition_col="part")
    assert _rows(spark, path) == sorted(map(tuple, upd))
