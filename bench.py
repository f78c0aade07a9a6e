#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on one shared local[$SPARK_GRAFT_CPUS]
session and prints ONE JSON line on stdout:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, "passes": 2,
     "warmup_sec": W, "pass_walls": [...],
     "queries_elided": K, "full": "BENCH_full.json"}

Each query is executed with a `noop` write — full plan execution on the
executors, zero driver materialization — so the timing measures the
engine, not result transfer.

Measurement boundary (round-5 ADVICE, bench.py:97): ``value`` is
warm-up + the first pass's suite wall, i.e. the timer starts BEFORE the
session warm-up block — the same boundary the original single-pass
harness measured, so committed suite walls stay comparable across every
round. ``warmup_sec`` is also reported separately.

Noise posture (round-4 verdict #6): the suite runs ``--passes`` times
(default 2; env SPARK_GRAFT_BENCH_PASSES overrides). ``queries``
carries the per-query MIN across passes (the scheduling-noise-free
per-query cost); the full per-pass matrix lives in BENCH_full.json.

Stdout size contract (round-5 verdict #8): the driver stores only the
TAIL (~2 KB) of stdout, and a 143-query map is ~4 KB — every earlier
round's driver bench artifact therefore ended up truncated and
unparseable ("parsed": null). The single stdout line now keeps itself
under ~1.1 KB / 10 queries by carrying only the SLOWEST queries (they are the ones
cross-round comparisons need), with ``queries_elided`` counting the
fast ones dropped from the line; the COMPLETE payload — full per-query
map and per-pass matrix — is always written to BENCH_full.json, which
is committed per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# keep the stdout JSON line inside the driver's ~2 KB stdout-tail window.
# r7 lesson (VERDICT r7 #2): 1800 left no headroom for post-line Spark
# shutdown chatter once the registry hit 161 queries — the driver's tail
# captured a mid-JSON fragment ("parsed": null). 1100 + a hard 10-query
# cap keeps the line well inside the window at any registry size.
_STDOUT_LINE_BUDGET = 1100
_STDOUT_MAX_QUERIES = 10

# Per-query warm-min ceilings (seconds, sf0.1) for queries that have
# silently regressed before (round-8 verdict: sim_minhash_lsh went
# 1.3 s → 5.0 s warm behind a green hash; sim_cosine_exact_pairs
# wobbled 4.4 s ↔ 11.3 s between passes). Visibility guard, not a
# failure gate: a breach rides the stdout line as "over_budget" so the
# per-round record shows the regression the moment it happens.
_WARM_BUDGETS_SF01 = {
    "sim_minhash_lsh": 3.0,
    "sim_cosine_exact_pairs": 9.0,
    # round 9b: the sketch families moved to one-md5 affine lanes
    # (join_bloom probe 3.6→2.0 s, countmin 2.4→1.0 s warm) — pinned so
    # a per-lane hash can't silently creep back in. The pins catch the
    # 2-4x cost of re-hashing per lane, sized ABOVE host-contention
    # wobble (this VM's in-suite warm mins ranged 4.3-5.8 s across
    # three same-code runs on 2026-08-15).
    "join_bloom_prefiltered": 7.0,
    "agg_countmin_freq": 3.0,
    # round 10: er_mutual_best's record-level formulation measured
    # >10 min at sf0.1 before the name-domain reduction (1.9 s warm) —
    # the pin guarantees any future edit that re-materializes record
    # pairs is caught the same round; the other two are the round's
    # heaviest new queries (5.5-5.7 s warm), pinned above wobble.
    "er_mutual_best": 5.0,
    # post-tuning warm levels (jaccard 3.8 s, gzip 2.5 s, phash 2.2 s):
    # the pins catch the recompute/parallelism regressions each one had
    # before its fix (branch re-execution of the Python hash pipeline,
    # 3-file gzip write, record-level ER pairs)
    "graph_jaccard_neighbors": 7.0,
    "scan_gzip_roundtrip": 6.0,
    "multimodal_image_phash": 6.0,
    # round 11: graph_pagerank regressed 3.2→5.5 s warm (25.7 s outlier
    # pass) on UNCHANGED code — orphaned localCheckpoint blocks from
    # ~200 earlier queries were taxing the late-suite iterative plans
    # (clearCache never frees checkpointed RDDs; the sweep below now
    # does). Pinned with the two same-code drifters from the r10 bench
    # (hive 0.6→1.5 s, char_diversity 3.3→3.9 s), sized above wobble.
    "graph_pagerank": 5.0,
    "text_char_diversity": 6.0,
    "scan_hive_partitioned": 3.0,
    # round 11: the heaviest new query — two bloom builds + both-side
    # probes + SMJ measured 4.2-4.3 s warm at sf0.1 (m=2^17); the pin
    # catches a regression to per-lane hashing or a broadcast fallback
    "join_semireduced": 9.0,
    # round 12 (r11 verdict task #1): the two unpinned drifters whose
    # driver-host wobble rode the +22% suite regression in unguarded.
    # bpe_train/encode now train in ONE guarded task (no 12-action
    # serialism left to amplify; warm ~1-2 s), the portable-CC family
    # is pinned at its post-repartition level so host drift on the
    # connected-components path surfaces as over_budget immediately.
    "pipeline_bpe_train": 5.0,
    "pipeline_bpe_encode": 6.0,
    "pipeline_canonical_docs": 3.5,
    "pipeline_dedup_clusters_portable": 3.5,
    "pipeline_corpus_build": 4.5,
    # round 13 (r12 verdict task #6): the two heaviest round-12
    # additions (session_native 1.2 s warm / sf1 slope 0.53 — streaming
    # state growth; dsir_select 1.9 s warm — two bigram models + an
    # instance join). r11 proved unpinned heavies drift silently; sized
    # ~3x warm, above this host's in-suite wobble.
    "stream_session_native": 3.5,
    "pipeline_dsir_select": 4.5,
    # round 13 (r12 verdict task #3): the r11→r12 drift (0.72→1.27 s)
    # was measured to be same-plan wobble, NOT the shared-kernel
    # extraction (isolated A/B in SCALING.md §1b) — pinned so a real
    # plan regression is caught as over_budget next time.
    "pipeline_bigram_kn": 4.0,
    # round 14 (r13 verdict task #2): the heaviest unpinned query —
    # real readStream micro-batch machinery, 3.1-3.9 s warm across
    # hosts; fixed overhead, pinned ~2x warm above wobble.
    "stream_cdc_stateful": 7.0,
    # round 14: the three new executed/streaming queries, pinned at
    # ~2-3x their measured warm level (stream_corpus_delta 3.6 s —
    # 4-epoch stateful stream; vacuum 2.7 s — its own 4-epoch stream
    # build; merge_evolve 1.1 s — one keyed join + 3 snapshot scans).
    "stream_corpus_delta": 8.0,
    "pipeline_vacuum": 7.0,
    "pipeline_merge_evolve": 3.5,
    # round 14: distributed IVFADC, ~2.8 s warm certified at sf0.1
    # after the cell/8 shortlist fix (the half-cell first cut measured
    # 6.8 s — the pin catches a regression back to a wide rerank join)
    "sim_cosine_ivfpq": 8.0,
    # round 14: publication-gated index commit — reuse path reads two
    # persisted indexes (~0.5 s warm); the pin catches a regression to
    # re-signing the corpus instead of only the published delta
    "dedup_stream_index_append": 4.0,
    # round 14: the vector live loop — reuse path reads the committed
    # ledger (~0.3 s warm; cold build ~8.5 s rides pass 0 only); the
    # pin catches a regression to rebuilding the stream per call
    "stream_embedding_delta": 4.0,
    # round 15: IVFADC on the persisted code table (~2.4 s warm — same
    # probe pipeline as the twin, codes read from the one-file-per-cell
    # parquet lists; the pin catches a regression to per-call corpus
    # re-encode, which the builds-counter pytest also gates), the
    # executed code-index append (~0.5 s warm reuse path — two
    # partial-aggregated index scans; pin catches re-encoding v1), and
    # the merge-table snapshot expiry (~0.4 s warm — idempotent
    # re-vacuum + two manifest-pinned snapshot reads; pin catches a
    # regression to rebuilding the vtable pool per call)
    "sim_cosine_ivfpq_reuse": 8.0,
    "sim_ivfpq_index_append": 4.0,
    "pipeline_merge_vacuum": 3.5,
    # round 16 (r15 verdict task #6): the three r15 TPC-H shapes get
    # the same individual-pin discipline as the similarity/layout r15
    # additions (measured warm sf0.1: 1.26 / 1.38 / 0.96 s — broadcast
    # dims + one keyed exchange each; pins ~3x warm, above wobble)
    "agg_important_stock": 4.0,
    "agg_supplier_part_types": 4.0,
    "join_promo_share_suppliers": 3.0,
    # round 16 additions (measured warm sf0.1: custdist 0.94 s —
    # broadcast outer join + one custkey exchange; disjunctive 0.66 s
    # — two pushed-disjunction scans + broadcast join; index vacuum
    # 2.30 s — three appender reuse reads + metadata sweep; cell skew
    # 0.57 s — two partial-aggregated code-table scans. The vacuum pin
    # catches a regression to rebuilding any index line per call; the
    # skew pin catches a regression to re-running the quantizer.)
    "agg_custdist_outer": 3.0,
    "join_disjunctive_pushdown": 2.5,
    "pipeline_index_vacuum": 6.0,
    "sim_ivfpq_cell_skew": 2.5,
    # Q9 shape (measured warm sf0.1: 1.33 s — four broadcast dims +
    # one keyed exchange; the pin catches a regression to joining
    # orders before the part semi-reduction)
    "agg_product_profit": 4.0,
    # round 17 additions (measured warm sf0.1 in the A/B: classifier
    # 0.44 s — one explode + broadcast weight join + one doc-keyed
    # aggregate riding the branches' partitioning; member skew 0.25 s
    # — two counts-only member-line scans; shipping_priority 0.60 s,
    # local_supplier_volume 0.84 s, forecast 0.30 s. The classifier
    # pin catches a regression to shuffling the feature stream against
    # the weight table or re-introducing the spine SortMergeJoin; the
    # member-skew pin catches a regression to re-running the quantizer
    # or re-reading vectors instead of the pruned cell column.)
    "pipeline_quality_classifier": 2.5,
    "sim_ivf_member_skew": 2.0,
    "join_shipping_priority": 2.5,
    "join_local_supplier_volume": 3.0,
    "agg_forecast_revenue": 1.5,
    # round 18 additions (measured warm sf0.1 in the A/B:
    # shuffle_shard 0.36/0.66 s — one bucket-keyed exchange + a
    # 256-row broadcast base frame; the pin catches a regression to a
    # single-partition global window. gen_serving 3.63/5.38 s — the
    # exact all-pairs certification leg over corpus ∪ twins dominates,
    # the same cost class as the other ANN recall certifications; the
    # pin catches a regression to re-running the all-pairs baseline
    # per certification branch (the pre-checkpoint plan) or to
    # re-encoding the gen-1 line per call.)
    "pipeline_shuffle_shard": 2.0,
    "sim_ivfpq_gen_serving": 9.0,
}

# Suite-level WARM budget (r13 verdict task #2): the r12→r13 driver
# bench drifted +16.5% with no per-query pin breached — broad uniform
# drift plus between-query hygiene growth that only a SUITE gate can
# see. The warm wall (best pass after warm-up) is the comparable
# number. After the r14 hygiene diet (listTables + full gen-2 gc moved
# to the every-8th block — measured 78 → 24 s hygiene/pass, warm wall
# 294 → 238 s on the build host, zero pin breaches), 300 s sits ~16%
# above the expected driver-host warm level (~258 s at the historical
# +9% host factor), so a repeat of the r13 drift magnitude surfaces
# as over_budget_suite in-round. The per-pass hygiene_sec field
# decomposes any breach: wall = query-sum + hygiene (measured), so
# drift attribution no longer needs git archaeology.
_SUITE_WARM_BUDGET_SF01 = 300.0

# Suite-level WARM QUERY-SUM budget (r15 verdict task #5): the r15
# round measured ±17% same-code pass-to-pass WALL swings on this host
# (352/326, 285/334, 339/386/276 s) against r14's 0.5% — the wall gate
# can false-positive or mask a real ~10% regression under that noise.
# The query-sum (Σ per-query timings within one pass) excludes the
# hygiene component and is the measured-stable signal: 215.7/215.8 s
# in the r14 same-code A/B, 217.2 s at r15 (253 queries). Derivation
# (SCALING.md r16 note): stable component ~217 s + ~4 s for the four
# r16 additions ≈ 221 s expected; 260 s ≈ +18% headroom — above
# measured query-sum wobble, below the r13-magnitude (+16.5%) drift
# this gate exists to catch. Per-query pins stay primary; both suite
# gates are visibility guards, not failure gates.
_SUITE_WARM_QUERYSUM_BUDGET_SF01 = 260.0


def _calibrate() -> float:
    """Fixed single-core host-speed probe (r18 verdict item 8): a pure-
    Python integer loop whose work is identical on every run, timed in
    seconds. ~0.3 s on the reference-speed driver host; the r18/r19
    sessions measured the same loop drifting 1.5-2.5× on this sandbox
    within hours. Reported in the headline JSON as ``calib_sec``
    [before-warm-up, after-last-pass] so cross-run suite comparisons
    (the driver's PERF ratios) can be normalized for host speed instead
    of mistaking drift for plan regressions. Additions-only: no timing
    path of any query changes."""
    t0 = time.perf_counter()
    x = 0
    for i in range(4_000_000):
        x += i
    _ = x
    return round(time.perf_counter() - t0, 3)


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
    calib_start = _calibrate()  # host-speed probe, outside the suite timer
    t_suite0 = time.perf_counter()  # BEFORE warm-up — see docstring
    spark = get_spark(app_name="pde-bench")
    registry = load_registry()

    # Warm the session (JVM/codegen) on the flagship before per-query
    # timing, and spin up the reusable Python/Arrow worker pool with one
    # trivial mapInPandas — otherwise the alphabetically-first
    # pandas-UDF query absorbs the worker cold-start into its
    # measurement. This block is INSIDE the suite-wall timer.
    try:
        from projektdataengineering_spark.flagship import flagship

        flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.range(32).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
        # Warm the text/columnar WRITER paths too: the csv/json/orc
        # datasources JIT their write+read pipelines on first use, and
        # without this the alphabetically-early scan_*_roundtrip
        # queries absorb ~5 s of one-time codegen into pass 0 (measured
        # r6: all three "regressed" +0.3-0.6 s for exactly this reason
        # — min-of-2-passes still included one cold component).
        warm_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".scratch", "bench_warmup"
        )
        tiny = spark.range(10).selectExpr(
            "id", "cast(id as string) s", "timestamp'2024-01-01' ts"
        )
        for fmt in ("csv", "json", "orc"):
            p = os.path.join(warm_dir, fmt)
            tiny.write.mode("overwrite").format(fmt).save(p)
            spark.read.format(fmt).load(p).write.format("noop").mode(
                "overwrite"
            ).save()
    except Exception as exc:
        print(f"bench: warm-up failed: {exc}", file=sys.stderr)
    warmup_sec = round(time.perf_counter() - t_suite0, 3)

    import gc

    pass_timings: list[dict[str, float]] = []
    pass_walls: list[float] = []
    pass_hygiene: list[float] = []  # attribution: wall = Σqueries + this
    for _ in range(n_passes):
        timings: dict[str, float] = {}
        t_pass = time.perf_counter()
        hygiene_sec = 0.0
        for qi, name in enumerate(sorted(registry)):
            qd = registry[name]
            t_hyg = time.perf_counter()
            # Session hygiene BETWEEN queries, inside the pass wall but
            # outside each per-query timer (the tools/scale_probe.py
            # lesson, applied here in round 8): drop cached/checkpoint
            # blocks (cheap, every query) and force a JVM GC every 8th
            # so one query's leftovers can't tax a later query's
            # driver-side loop. Measured: without this,
            # pipeline_bpe_train (12 sequential argmax actions) reads
            # 11-16 s mid-suite vs ~5 s in a clean session — the
            # accumulated state of ~100 earlier queries, not bpe
            # itself, was being measured. (A per-query System.gc makes
            # every number clean but adds ~0.6 s × registry to the
            # wall; every-8th keeps per-query noise ≲1 s at ~1/8 the
            # gc cost.)
            # young-generation collect per query (frees the previous
            # query's DataFrame/py4j cycles at ~1-5 ms); the FULL gen-2
            # collect rides the every-8th block below — at 245 queries
            # the per-query full scan of the grown module heap measured
            # ~64 ms each (~16 s/pass) for no additional reclaim
            gc.collect(1)
            spark.catalog.clearCache()
            # clearCache drops only CATALOG-cached relations; RDD blocks
            # from localCheckpoint (the lineage-cut discipline of every
            # iterative operator — pagerank/CC/BFS create ~15 per run)
            # stay in the block manager until the driver GCs the
            # DataFrame refs AND the async ContextCleaner gets around to
            # them. Across 217 queries × 2 passes those orphans add up
            # to real storage-memory pressure: r10 measured
            # graph_pagerank at 5.45 s warm with a 25.7 s outlier pass
            # late in the suite vs 3.2 s in a clean session, on
            # unchanged code. No query holds persisted state across
            # calls (verified: zero module-level .persist/.cache), so
            # everything still pinned here is an orphan — drop it
            # synchronously instead of waiting on weak-ref cleanup.
            try:
                for jrdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    jrdd.unpersist(False)
                # streaming queries leave their memory-sink tables
                # registered (driver-held rows); drop them so two
                # passes over 30+ streaming queries don't pile up
                # driver memory and stretch the periodic System.gc.
                # Every 8th query (with the JVM gc), NOT every query:
                # the r14 hygiene decomposition measured listTables as
                # the single largest hygiene component (~135 ms RPC ×
                # registry = ~33 s/pass, 52% of the total) while the
                # pileup it prevents is bounded by 8 queries' views —
                # a handful of driver-side metadata entries
                if qi % 8 == 0:
                    for tbl in spark.catalog.listTables():
                        if tbl.tableType == "TEMPORARY" and tbl.name.endswith(
                            ("_sink", "_out")
                        ):
                            spark.catalog.dropTempView(tbl.name)
            except Exception as hyg_exc:
                # hygiene must never fail the bench — but a silently
                # dead sweep would let the checkpoint-orphan drift it
                # prevents (pagerank 3.2→5.5 s) return with no signal,
                # so make the breakage visible once per query
                print(
                    f"bench: hygiene sweep failed before {name}: "
                    f"{type(hyg_exc).__name__}: {hyg_exc}",
                    file=sys.stderr,
                )
            if qi % 8 == 0:
                gc.collect()  # full gen-2 pass, amortized
                spark._jvm.System.gc()
            hygiene_sec += time.perf_counter() - t_hyg
            t0 = time.perf_counter()
            try:
                qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # record failures, keep benching
                timings[name] = -1.0
                print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
        pass_walls.append(round(time.perf_counter() - t_pass, 3))
        pass_timings.append(timings)
        pass_hygiene.append(round(hygiene_sec, 3))
    # per-pass Σ of successful per-query timings — the hygiene-free,
    # noise-robust suite signal the query-sum gate below reads
    pass_query_sums = [
        round(sum(v for v in p.values() if v >= 0), 3) for p in pass_timings
    ]

    # per-query min across passes; a -1.0 (failure) in ANY pass wins so
    # failures stay visible as failures
    merged: dict[str, float] = {}
    for name in pass_timings[0]:
        vals = [p[name] for p in pass_timings]
        merged[name] = -1.0 if any(v < 0 for v in vals) else min(vals)

    calib_end = _calibrate()  # host drift across the run, same probe
    headline = {
        "metric": "suite_wall_sec",
        # warm-up + first pass: the boundary every round's committed
        # number has used (see docstring)
        "value": round(warmup_sec + pass_walls[0], 3),
        "unit": "sec",
        "sf": _sf_of(SF_DIR),
        "passes": n_passes,
        "warmup_sec": warmup_sec,
        "pass_walls": pass_walls,
        "hygiene_sec": pass_hygiene,
        "query_sums": pass_query_sums,
        # host-speed calibration (see _calibrate): [start, end] of run
        "calib_sec": [calib_start, calib_end],
        # headline-level failure count: survives even if the stdout
        # byte budget truncates individual failure entries below
        "failed": sum(1 for v in merged.values() if v < 0),
    }
    if abs(_sf_of(SF_DIR) - 0.1) < 1e-9:
        over = {
            n: merged[n]
            for n, cap in _WARM_BUDGETS_SF01.items()
            if merged.get(n, -1.0) > cap
        }
        if over:
            headline["over_budget"] = over
        # suite-level warm gate: best post-warm-up pass wall.  The
        # gate is warm-only by definition (mirroring the per-query
        # budgets), so a single-pass invocation — whose one wall
        # absorbs the cold scratch builds of the streaming-class
        # queries (e.g. stream_embedding_delta ~8.5 s cold vs ~0.3 s
        # warm) — is flagged informationally, never failed (r14
        # ADVICE: a fresh-.scratch single pass emitted a spurious
        # over_budget_suite).
        if len(pass_walls) > 1:
            warm_wall = min(pass_walls[1:])
            if warm_wall > _SUITE_WARM_BUDGET_SF01:
                headline["over_budget_suite"] = {
                    "warm_wall": warm_wall,
                    "budget": _SUITE_WARM_BUDGET_SF01,
                }
            # the hygiene-free signal: stable under the host noise that
            # degrades the wall gate (see the budget's derivation note).
            # Only CLEAN passes count: a pass with a failed query sums
            # fewer terms, so its artificially low qsum could mask a
            # regression the gate exists to catch (r16 ADVICE) — the
            # failure itself stays visible via the 'failed' headline.
            clean_qsums = [
                s
                for s, p in zip(pass_query_sums[1:], pass_timings[1:])
                if all(v >= 0 for v in p.values())
            ]
            if clean_qsums:
                warm_qsum = min(clean_qsums)
                if warm_qsum > _SUITE_WARM_QUERYSUM_BUDGET_SF01:
                    headline["over_budget_qsum"] = {
                        "warm_query_sum": warm_qsum,
                        "budget": _SUITE_WARM_QUERYSUM_BUDGET_SF01,
                    }
            else:
                headline["qsum_gate_skipped_failures"] = {
                    "budget": _SUITE_WARM_QUERYSUM_BUDGET_SF01,
                }
        elif pass_walls[0] > _SUITE_WARM_BUDGET_SF01:
            headline["suite_gate_skipped_cold"] = {
                "cold_wall": pass_walls[0],
                "budget": _SUITE_WARM_BUDGET_SF01,
            }

    # complete record → BENCH_full.json (committed per round)
    full_payload = json.dumps(
        {**headline, "queries": merged, "queries_passes": pass_timings}
    )
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_full.json"), "w") as fh:
            fh.write(full_payload + "\n")
    except OSError as exc:
        print(f"bench: could not write BENCH_full.json: {exc}", file=sys.stderr)

    # stdout line: failures always included, then slowest-first until
    # the size budget OR the hard query cap is hit (BENCH_full.json
    # always carries the complete record)
    ordered = sorted(merged, key=lambda n: (merged[n] >= 0, -merged[n]))
    n_failed = sum(1 for v in merged.values() if v < 0)
    kept: dict[str, float] = {}
    for name in ordered:
        is_fail = merged[name] < 0
        if not is_fail and len(kept) >= max(_STDOUT_MAX_QUERIES, n_failed):
            break
        kept[name] = merged[name]
        line = json.dumps(
            {**headline, "queries": kept,
             "queries_elided": len(merged) - len(kept),
             "full": "BENCH_full.json"}
        )
        # failure entries are exempt from byte-budget eviction (the
        # headline "failed" count backstops even a hard truncation)
        if len(line) > _STDOUT_LINE_BUDGET and len(kept) > 1 and not is_fail:
            del kept[name]
            break
    print(json.dumps(
        {**headline, "queries": kept,
         "queries_elided": len(merged) - len(kept),
         "full": "BENCH_full.json"}
    ))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
