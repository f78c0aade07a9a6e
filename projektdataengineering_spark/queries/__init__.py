"""Declared query registry — the SURVEY.md §2.3 correctness contract.

Each query is registered once, with its Spark callable and (when
SQL-expressible) its DuckDB oracle SQL right next to it, via the
``@query`` decorator.  ``__spark_entry__.py`` exposes the registry to the
driver; the local test harness (tests/test_oracle.py) replays the driver's
differential check (row count + schema + order-insensitive value hash)
against DuckDB on the same parquet fixtures.

Conventions (enforced by the harness):
* every computed column is aliased identically in Spark and SQL;
* ordered+limited queries carry a unique tiebreaker in the sort key;
* money-double aggregation goes through the decimal-exact helpers in
  ``functions`` (see that module's docstring for why);
* integer-valued computed columns are cast to BIGINT on both sides
  (Spark's year() is INT, DuckDB's is BIGINT — pin them equal).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The shared incremental high-water-mark literal (reference O4 semantics).
# Lives here — not in scans.py — because several query modules embed it in
# their oracle SQL, and importing scans from another query module would
# register scans' queries out of _MODULES order (the driver's correctness
# window records the first 50 registry entries, so order is contractual).
HWM_LITERAL = "2024-01-15 00:00:00"


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    family: str


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, family: str = "misc"):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, family=fn.__module__.rsplit(".", 1)[-1] if family == "misc" else family)
        return fn

    return deco


# Registration order is part of the driver contract: the driver's
# correctness pass records the FIRST 50 registry entries, so the
# families whose queries still lack a driver correctness row must come
# first.  Round 1 verified scans/joins/aggregates/windows/setops/
# scalars (+ dedup_exact) — round 2 front-loads the 30 queries the
# 50-entry window missed (text/similarity/streaming/udfs/multimodal/
# mlprep/dedup) plus the new pipeline_ops family, and pushes the
# already-green families past the cap (they stay regression-guarded by
# tests/test_oracle.py, which checks the WHOLE registry).
_MODULES = (
    "text",
    "similarity",
    "streaming_batch",
    "udfs",
    "multimodal",
    "mlprep",
    "dedup",
    "pipeline_ops",
    "scans",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalars",
    # round-2 extensions — deliberately LAST: this round's 50-entry
    # correctness window is already packed with round-1-unverified
    # queries; these rotate into the window next round.
    "advanced",
    "pipeline_llm",
)


# Window packing: the driver's correctness pass records the FIRST 50
# registry entries, so membership there is contractual. Oracle-bearing
# queries that still lack a driver hash row are PROMOTED into the
# window; rows-only queries (no SQL oracle — a driver row proves only
# clean execution, which their local calibration tests pin harder:
# ground-truth cosine vs numpy, ANN recall, signature determinism) are
# DEFERRED to the tail to make room.
_PROMOTE_TO_WINDOW = (
    "join_skew_salted",
    "pipeline_sequence_pack",
    "pipeline_incremental_rollup",
)
_DEFER_TO_TAIL = (
    # rows-only (local calibration > a rows-only driver row):
    "sim_cosine_topk",
    "sim_cosine_ivf",
    "sim_simhash",
    "sim_cosine_ann_lsh",
    "sim_minhash_lsh",
    # round-1-verified (green hash rows in CORRECTNESS_r01.json) — defer
    # to free their window slots for queries that never had a driver row:
    "dedup_exact",
    "scan_project_cast",
)


def load_registry() -> dict[str, QueryDef]:
    """Import all query modules (populating REGISTRY) and return it,
    with _PROMOTE_TO_WINDOW entries moved to the front and
    _DEFER_TO_TAIL entries moved to the end (dict order is the
    driver's correctness-window order — contractual, see _MODULES)."""
    for mod in _MODULES:
        import_module(f"{__package__}.{mod}")
    promoted = {n: REGISTRY.pop(n) for n in _PROMOTE_TO_WINDOW if n in REGISTRY}
    if promoted:
        rest = dict(REGISTRY)
        REGISTRY.clear()
        REGISTRY.update(promoted)
        REGISTRY.update(rest)
    for name in _DEFER_TO_TAIL:
        if name in REGISTRY:
            REGISTRY[name] = REGISTRY.pop(name)
    return REGISTRY
