#!/usr/bin/env python
"""Isolated per-query timing + plan capture for the optimization rounds.

Usage:
    python tools/time_queries.py name [name...] [--sf DIR] [--reps N]
        [--plan-dir plans/r18] [--plan-suffix before]

Runs each named registered query on the SAME engine session bench.py
uses (get_spark, local[$SPARK_GRAFT_CPUS]) with the noop sink (guide
§1.4), --reps times after one untimed warm run, printing per-rep
seconds and the min.  With --plan-dir, writes the query's
``explain('formatted')`` to <plan-dir>/<name>_<suffix>.txt.

This times the computation in a CLEAN session (no 264 other queries'
state), so numbers are comparable across edits of one query; the full
bench stays the cross-round record.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="before")
    ns = ap.parse_args()

    from projektdataengineering_spark.queries import load_registry
    from projektdataengineering_spark.session import get_spark

    spark = get_spark(app_name="pde-time-queries")
    registry = load_registry()

    # same worker-pool warm-up as bench.py so pandas-UDF queries don't
    # absorb the Arrow worker cold start
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in ns.names:
        qd = registry[name]
        if ns.plan_dir:
            os.makedirs(ns.plan_dir, exist_ok=True)
        spark.sparkContext.setJobDescription(f"time: {name}")
        times = []
        for rep in range(ns.reps + 1):
            t0 = time.perf_counter()
            qd.fn(spark, ns.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rep > 0:  # rep 0 is the untimed warm run
                times.append(dt)
            print(f"  {name} rep{rep}{' (warm-up)' if rep == 0 else ''}: {dt:.3f}s",
                  file=sys.stderr)
        print(f"{name}: min {min(times):.3f}s  reps {[round(t, 3) for t in times]}")
        if ns.plan_dir:
            df = qd.fn(spark, ns.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = os.path.join(ns.plan_dir, f"{name}_{ns.plan_suffix}.txt")
            with open(out, "w") as fh:
                fh.write(txt)
            print(f"  plan -> {out}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
