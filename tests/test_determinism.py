"""Determinism of the rows-only (non-oracle) queries: the driver can
only count rows for these, so run-to-run stability is OUR claim to
enforce. Every approximate operator is re-executed in the same session
and must reproduce its result set exactly — the property the fixed
hash families, seeded-literal planes, and decimal-exact k-means
updates exist to provide.
"""

from __future__ import annotations

import pytest

from projektdataengineering_spark.queries import load_registry

REGISTRY = load_registry()

# Every rows-only query that returns a deterministic relation (i.e. all
# of them — determinism is the design rule; see module docstrings).
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


def _canon(df):
    return sorted(map(tuple, (tuple(r) for r in df.collect())))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_run_to_run_deterministic(name, spark, sf_dir):
    qd = REGISTRY[name]
    first = _canon(qd.fn(spark, sf_dir))
    second = _canon(qd.fn(spark, sf_dir))
    assert first == second, f"{name}: result set changed between runs"
