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


# Partitioning invariance: every result must be a pure function of the
# DATA, not of how the scan was split (the property the decimal-exact
# money sums, md5 hash lanes, and per-row-pure Arrow kernels exist to
# provide — and the precondition for the driver's value-hash check to
# be meaningful on a real cluster, where split counts differ run to
# run). Shrinking maxPartitionBytes multiplies the input split count,
# changing partial-aggregation order and Arrow batch boundaries.
_PARTITIONING_SENSITIVE = [
    "agg_groupby_multi",  # decimal-exact money aggregation
    "agg_quantile_sketch",  # sketch merge order + exact rank picks
    "pipeline_feature_hash",  # signed-count merge order
    "pipeline_time_interpolate",  # hourly cents sums feeding the lerp
    "er_mutual_best",  # Arrow JW kernel batch boundaries
    "multimodal_image_phash",  # mapInPandas codec batch boundaries
    "sim_minhash_lsh",  # md5 lane kernel + bucket join order
]


@pytest.mark.parametrize("name", _PARTITIONING_SENSITIVE)
def test_result_is_invariant_to_input_split_size(name, spark, sf_dir):
    qd = REGISTRY[name]
    default = spark.conf.get("spark.sql.files.maxPartitionBytes")
    base = _canon(qd.fn(spark, sf_dir))
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        resplit = _canon(qd.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", default)
    assert base == resplit, f"{name}: result depends on input split size"
