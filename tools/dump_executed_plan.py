#!/usr/bin/env python
"""Dump the EXECUTED (post-AQE, isFinalPlan=true) physical plan of a
registered query — the runtime evidence static explain() cannot give
(ReusedExchange / reused shuffle stages only appear after execution).

Usage:
    python tools/dump_executed_plan.py name [name...] [--sf DIR]
        [--out plans/r19] [--suffix executed]

Runs the query once with the noop sink, then explains the SAME
DataFrame instance (whose AdaptiveSparkPlan is now final) and writes
<out>/<name>_<suffix>.txt. Also prints a one-line summary counting
Exchange / ReusedExchange / ArrowEvalPython / BatchEvalPython nodes.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r19")
    ap.add_argument("--suffix", default="executed")
    ns = ap.parse_args()

    from projektdataengineering_spark.queries import load_registry
    from projektdataengineering_spark.session import get_spark

    spark = get_spark(app_name="pde-dump-executed")
    registry = load_registry()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    os.makedirs(ns.out, exist_ok=True)

    for name in ns.names:
        df = registry[name].fn(spark, ns.sf)
        spark.sparkContext.setJobDescription(f"executed-plan: {name}")
        # drive the DataFrame's OWN QueryExecution (a noop write would
        # execute a separate write-command QE and leave df's adaptive
        # plan unfinalized — isFinalPlan would stay false)
        n = len(df.collect())
        qe = df._jdf.queryExecution()
        txt = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = os.path.join(ns.out, f"{name}_{ns.suffix}.txt")
        with open(out, "w") as fh:
            fh.write(txt)
        counts = {
            pat: len(re.findall(rf"(?m)^\s*[+:*\-]*\s*\(?\d*\)?\s*{pat}", txt))
            for pat in (
                "Exchange", "ReusedExchange", "ShuffleQueryStage",
                "ArrowEvalPython", "BatchEvalPython", "AQEShuffleRead",
            )
        }
        # simpler robust count: substring occurrences per node label
        counts = {
            pat: txt.count(f" {pat} ") + txt.count(f"{pat} (")
            for pat in (
                "Exchange", "ReusedExchange", "ArrowEvalPython",
                "BatchEvalPython", "AQEShuffleRead", "TableCacheQueryStage",
            )
        }
        print(f"{name}: {counts} -> {out}")
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
