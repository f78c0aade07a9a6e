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


_MODULES = (
    "scans",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalars",
    "dedup",
    "text",
    "similarity",
    "streaming_batch",
    "udfs",
    "multimodal",
    "mlprep",
)


def load_registry() -> dict[str, QueryDef]:
    """Import all query modules (populating REGISTRY) and return it."""
    for mod in _MODULES:
        import_module(f"{__package__}.{mod}")
    return REGISTRY
