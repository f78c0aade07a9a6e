"""Multimodal pipeline query — the registry face of
operators/multimodal.py (rows-only check: decode+featurize is not
SQL-expressible; codec and feature correctness are unit-tested in
tests/test_multimodal.py against pure-Python recomputes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.multimodal import attach_png_payload, extract_features
from . import query


@query("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image pipeline end-to-end: each document rendered as an
    actual PNG (attach_png_payload — signature, zlib, scanlines), then
    Arrow-batched decode + featurization over the DECODED pixels
    (extract_features(fake=False) → operators/codecs.png_decode). Both
    directions of the codec run distributed, deterministically; see
    operators/multimodal.py for the 100-TB partition-sizing notes.
    Video remains the one documented NotImplementedError modality."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_png_payload(docs), fake=False)
