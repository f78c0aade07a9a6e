"""Multimodal pipeline query — the registry face of
operators/multimodal.py (rows-only check: the featurizer is a stubbed
model pass, not SQL-expressible; plumbing correctness is unit-tested in
tests/test_multimodal.py against a pure-Python recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.multimodal import attach_binary_payload, extract_features
from . import query


@query("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata → Arrow-batched feature
    extraction (deterministic fake featurizer standing in for the
    decode+model step; see operators/multimodal.py for the stub
    boundary and the 100-TB partition-sizing notes)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(docs), fake=True)
