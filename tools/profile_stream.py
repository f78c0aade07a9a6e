#!/usr/bin/env python
"""Micro-batch decomposition for the streaming-class queries (round 19,
VERDICT item 1: "profile one query's epochs to split plan/commit vs
state work").

Wraps ``streaming.run_to_memory_sink`` (and the raw ``q.awaitTermination``
drains used by the Python-source queries) to capture every
StreamingQueryProgress after the drain, then prints per-batch
``durationMs`` components (addBatch / getBatch / latestOffset /
queryPlanning / walCommit / commitOffsets / triggerExecution) and the
state-operator metrics — the evidence for where a 2-4 s streaming query
actually spends its wall clock.

Usage: python tools/profile_stream.py stream_cdc_stateful [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:] or ["stream_cdc_stateful"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from projektdataengineering_spark import streaming as S
    from projektdataengineering_spark.queries import load_registry
    from projektdataengineering_spark.session import get_spark

    spark = get_spark(app_name="pde-profile-stream")
    registry = load_registry()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    captured: list = []
    orig_run = S.run_to_memory_sink

    def wrapped(df, name, output_mode="complete"):
        t0 = time.perf_counter()
        q = orig_run(df, name, output_mode)
        wall = time.perf_counter() - t0
        captured.append((name, wall, [json.loads(p.json) for p in q.recentProgress]))
        return q

    S.run_to_memory_sink = wrapped
    # the queries import run_to_memory_sink from ..streaming INSIDE the
    # function body, so the module attribute patch reaches them

    try:
        for qname in names:
            qd = registry[qname]
            captured.clear()
            spark.sparkContext.setJobDescription(f"profile: {qname}")
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            total = time.perf_counter() - t0
            print(f"\n=== {qname}: total {total:.3f}s "
                  f"({len(captured)} stream run(s)) ===")
            for sink_name, wall, progress in captured:
                print(f"  stream {sink_name}: drain wall {wall:.3f}s, "
                      f"{len(progress)} micro-batch(es)")
                for p in progress:
                    dur = p.get("durationMs", {})
                    rows = p.get("numInputRows", 0)
                    comps = " ".join(
                        f"{k}={v}" for k, v in sorted(dur.items())
                    )
                    print(f"    batch {p.get('batchId')}: rows={rows} {comps}")
                    for so in p.get("stateOperators", []):
                        keep = {
                            k: so.get(k)
                            for k in (
                                "operatorName", "numRowsTotal", "numRowsUpdated",
                                "allUpdatesTimeMs", "commitTimeMs",
                                "stateMemory", "numShufflePartitions",
                            )
                            if k in so
                        }
                        print(f"      state: {keep}")
            spark.sparkContext.setJobDescription(None)
    finally:
        S.run_to_memory_sink = orig_run
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
