#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on one shared local[$SPARK_GRAFT_CPUS]
session and prints ONE JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1,
     "passes": 2, "pass_walls": [...], "queries_passes": [{...}, {...}]}

Each query is executed with a `noop` write — full plan execution on the
executors, zero driver materialization — so the timing measures the
engine, not result transfer.

Noise posture (round-4 verdict #6): the suite runs ``--passes`` times
(default 2; env SPARK_GRAFT_BENCH_PASSES overrides). ``value`` is the
FIRST pass's suite wall — directly comparable to the single-pass
BASELINE budget and to earlier rounds — while ``queries`` carries the
per-query MIN across passes (the scheduling-noise-free per-query cost)
and ``queries_passes`` keeps every raw pass so regressions can be told
apart from one-off contention.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _n_passes(argv: list[str]) -> int:
    n = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    if "--passes" in argv:
        n = int(argv[argv.index("--passes") + 1])
    return max(1, n)


def main() -> int:
    from projektdataengineering_spark.queries import load_registry
    from projektdataengineering_spark.session import get_spark

    n_passes = _n_passes(sys.argv[1:])
    spark = get_spark(app_name="pde-bench")
    registry = load_registry()

    # Warm the session (JVM/codegen) on the flagship before timing, and
    # spin up the reusable Python/Arrow worker pool with one trivial
    # mapInPandas — otherwise the alphabetically-first pandas-UDF query
    # absorbs the worker cold-start into its measurement.
    try:
        from projektdataengineering_spark.flagship import flagship

        flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.range(32).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception as exc:
        print(f"bench: warm-up failed: {exc}", file=sys.stderr)

    pass_timings: list[dict[str, float]] = []
    pass_walls: list[float] = []
    for _ in range(n_passes):
        timings: dict[str, float] = {}
        t_pass = time.perf_counter()
        for name in sorted(registry):
            qd = registry[name]
            t0 = time.perf_counter()
            try:
                qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # record failures, keep benching
                timings[name] = -1.0
                print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
        pass_walls.append(round(time.perf_counter() - t_pass, 3))
        pass_timings.append(timings)

    # per-query min across passes; a -1.0 (failure) in ANY pass wins so
    # failures stay visible as failures
    merged: dict[str, float] = {}
    for name in pass_timings[0]:
        vals = [p[name] for p in pass_timings]
        merged[name] = -1.0 if any(v < 0 for v in vals) else min(vals)

    payload = json.dumps(
        {
            "metric": "suite_wall_sec",
            "value": pass_walls[0],
            "unit": "sec",
            "queries": merged,
            "sf": _sf_of(SF_DIR),
            "passes": n_passes,
            "pass_walls": pass_walls,
            "queries_passes": pass_timings,
        }
    )
    print(payload)
    # The driver stores only the TAIL of stdout (~2 KB), which truncates
    # the per-query map to the end of the alphabet; persist the complete
    # JSON so every timing survives for the judge (round-3 verdict #6).
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_full.json"), "w") as fh:
            fh.write(payload + "\n")
    except OSError as exc:
        print(f"bench: could not write BENCH_full.json: {exc}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
