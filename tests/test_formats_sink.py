"""Custom Python data sink (sources/pysink.py): the manifest-visibility
protocol, driven at both API levels — the raw writer lifecycle
(orphan invisibility, abort GC, epoch replay) and the real
write/writeStream engine path (the registered queries carry the
end-to-end hash certification; these tests pin the failure modes the
happy path can't show)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from projektdataengineering_spark.sources.pydatasource import (
    register_synthetic_source,
)
from projektdataengineering_spark.sources.pysink import (
    LedgerBatchWriter,
    LedgerStreamWriter,
    read_ledger,
    register_ledger_sink,
)

SCHEMA = "row_id bigint, bucket int, payload string"


def test_batch_sink_manifest_visibility_and_orphans(spark, tmp_path):
    """Rows written through the real write.format() path are readable
    back exactly; a part file NO manifest names (failed/speculative
    task debris) is invisible to readers."""
    register_synthetic_source(spark)
    register_ledger_sink(spark)
    path = str(tmp_path / "ledger")
    df = (spark.read.format("synthdocs")
          .option("rows", 100).option("partitions", 4).load())
    df.write.format("ledgersink").option("path", path).mode("append").save()

    back = read_ledger(spark, path, SCHEMA)
    assert back.count() == 100
    assert back.agg(F.sum("row_id")).collect()[0][0] == sum(range(100))

    # plant an orphan: on disk, absent from the manifest → invisible
    with open(os.path.join(path, "part-orphan.jsonl"), "w") as fh:
        fh.write(json.dumps(
            {"row_id": 999, "bucket": 9, "payload": "zz"}) + "\n")
    again = read_ledger(spark, path, SCHEMA)
    assert again.count() == 100
    assert again.filter("row_id = 999").count() == 0

    manifest = json.load(open(os.path.join(path, "manifest.json")))
    assert manifest["n_rows"] == 100
    assert "part-orphan.jsonl" not in manifest["files"]


def test_batch_sink_abort_gc(tmp_path):
    """abort() garbage-collects exactly the parts its messages name;
    nothing becomes visible (no manifest is ever written)."""
    path = str(tmp_path / "aborted")
    w = LedgerBatchWriter({"path": path})

    class R:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return self._d

    msg = w.write(iter([R({"row_id": 1, "bucket": 1, "payload": "a"})]))
    assert os.path.exists(os.path.join(path, msg.filename))
    w.abort([msg, None])  # None = a task that never reported
    assert not os.path.exists(os.path.join(path, msg.filename))
    assert not glob.glob(os.path.join(path, "manifest*"))


def test_stream_sink_epoch_manifests_and_replay(spark, tmp_path):
    """The streaming sink commits one manifest per epoch; a replayed
    epoch REWRITES its manifest so the superseded parts become
    invisible orphans — committed content is unchanged (exactly-once
    per epoch by manifest swap, not by part dedup)."""
    register_synthetic_source(spark)
    register_ledger_sink(spark)
    path = str(tmp_path / "stream_ledger")
    stream = (spark.readStream.format("synthdocsfeed")
              .option("rows", 500).option("batchrows", 300)
              .option("partitions", 2).load())
    q = (stream.writeStream.format("ledgersink")
         .option("path", path)
         .option("checkpointLocation", os.path.join(path, ".ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination()

    manifests = sorted(glob.glob(os.path.join(path, "manifest-*.json")))
    assert len(manifests) == 2, manifests  # 300 + 200 rows
    back = read_ledger(spark, path, SCHEMA)
    assert back.count() == 500
    assert back.agg(F.sum("row_id")).collect()[0][0] == sum(range(500))

    # replay epoch 0 at the writer level: fresh parts, same batchId
    w = LedgerStreamWriter({"path": path})

    class R:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return self._d

    epoch0 = json.load(open(manifests[0]))
    rows = [R({"row_id": r, "bucket": r % 10,
               "payload": f"replay{r}"}) for r in range(3)]
    msg = w.write(iter(rows))
    w.commit([msg], int(manifests[0].rsplit("-", 1)[1].split(".")[0]))

    replayed = json.load(open(manifests[0]))
    assert replayed["files"] == [msg.filename]  # manifest swapped
    assert replayed["files"] != epoch0["files"]
    for old in epoch0["files"]:  # superseded parts orphaned, not read
        assert os.path.exists(os.path.join(path, old))
    back2 = read_ledger(spark, path, SCHEMA)
    assert back2.filter("payload like 'replay%'").count() == 3
    assert back2.count() == 500 - epoch0["n_rows"] + 3
