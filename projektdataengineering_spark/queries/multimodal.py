"""Multimodal pipeline query — the registry face of
operators/multimodal.py (rows-only check: decode+featurize is not
SQL-expressible; codec and feature correctness are unit-tested in
tests/test_multimodal.py against pure-Python recomputes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..catalog import load_table, spread_small_input
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
    # no spread here: the PNG leg's python cost is small enough that
    # the extra exchange costs more than it buys (A/B'd at sf0.1:
    # 0.80 s plain vs 0.94 s spread) — contrast the video leg below
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_png_payload(docs), fake=False)


@query("multimodal_video_frames", oracle=None)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pipeline end-to-end: each document packed into an
    actual AVI — even doc_ids as uncompressed BI_RGB, odd doc_ids as
    Motion-JPEG whose frames are baseline JPEGs from the pure-Python
    T.81 codec (operators/jpeg.py, round 7) — then the 1→N
    video→image expansion a training curriculum runs:
    sample_frames(fake=False) decodes the container (RIFF walk + DIB
    un-flip or full JPEG entropy-decode/IDCT per frame), strides 2
    frames per clip and re-encodes each as a standalone PNG, and
    extract_features(fake=False) featurizes the DECODED pixels of
    every sampled frame. Rows-only check (binary plumbing is not
    SQL-expressible); per-frame pixel fidelity for both codec paths is
    unit-tested in tests/test_multimodal.py. Output: 2 frame-feature
    rows per doc, keyed (doc_id, frame_idx) — deterministic."""
    # spread_small_input: the per-blob Python codec cost is the whole
    # query; a single-split local fixture would serialize it on one
    # core (measured 20.8 s vs ~2 s spread at sf0.1 with the MJPG leg).
    docs = spread_small_input(load_table(spark, sf_dir, "documents"))
    clips = attach_avi_payload(docs, width=16, n_frames=4, codec="mixed")
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


@query("multimodal_audio_features", oracle=None)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio pipeline end-to-end, completing the modality
    triangle (image r4, video r5, audio r6): each document rendered as
    an actual 16-bit PCM WAV (attach_wav_payload — RIFF/fmt/data via
    the vendored codec), then Arrow-batched decode + featurization
    over the DECODED samples (extract_audio_features): peak, EXACT
    integer energy, zero crossings, duration. Rows-only check (binary
    plumbing is not SQL-expressible); waveform fidelity and feature
    values are pinned against pure-python recomputes in
    tests/test_multimodal.py. Both directions run distributed with
    constant worker memory — the same mapInPandas profile as the
    image/video legs, which is the property that matters when the
    payload column is 100 TB of real clips."""
    from ..operators.multimodal import attach_wav_payload, extract_audio_features

    # no spread: WAV encode/decode is cheap; the exchange would cost
    # more than the python work (A/B'd at sf0.1: 0.77 s vs 1.69 s)
    docs = load_table(spark, sf_dir, "documents")
    return extract_audio_features(attach_wav_payload(docs))
