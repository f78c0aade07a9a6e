"""Multimodal pipeline query — the registry face of
operators/multimodal.py (rows-only check: decode+featurize is not
SQL-expressible; codec and feature correctness are unit-tested in
tests/test_multimodal.py against pure-Python recomputes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    attach_avi_payload,
    attach_png_payload,
    extract_features,
    sample_frames,
)
from . import query


@query("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image pipeline end-to-end: each document rendered as an
    actual PNG (attach_png_payload — signature, zlib, scanlines), then
    Arrow-batched decode + featurization over the DECODED pixels
    (extract_features(fake=False) → operators/codecs.png_decode). Both
    directions of the codec run distributed, deterministically; see
    operators/multimodal.py for the 100-TB partition-sizing notes."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_png_payload(docs), fake=False)


@query("multimodal_video_frames", oracle=None)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pipeline end-to-end: each document packed into an
    actual uncompressed AVI (attach_avi_payload — RIFF headers, DIB
    frames), then the 1→N video→image expansion a training curriculum
    runs: sample_frames(fake=False) decodes the container, strides 2
    frames per clip and re-encodes each as a standalone PNG, and
    extract_features(fake=False) featurizes the DECODED pixels of every
    sampled frame. Three real codec traversals per document (AVI
    encode → AVI decode → PNG encode → PNG decode), all inside
    Arrow-batched mapInPandas. Rows-only check (binary plumbing is not
    SQL-expressible); per-frame pixel fidelity is unit-tested in
    tests/test_multimodal.py. Output: 2 frame-feature rows per doc,
    keyed (doc_id, frame_idx) — deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    clips = attach_avi_payload(docs, width=16, n_frames=4)
    frames = sample_frames(clips, n_frames=2, fake=False)
    feats = extract_features(
        frames.select(
            (F.col("doc_id") * 10 + F.col("frame_idx")).alias("doc_id"),
            "modality", "payload", "n_bytes", "checksum",
        ),
        fake=False,
    )
    return feats.select(
        (F.col("doc_id") / 10).cast("long").alias("doc_id"),
        F.pmod("doc_id", F.lit(10)).cast("int").alias("frame_idx"),
        "modality", "n_bytes", "checksum", "feat_mean", "feat_argmax",
    )
