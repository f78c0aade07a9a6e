"""Multimodal (image/audio/video) column plumbing.

Design: media travel as opaque ``binary`` columns with typed metadata
(modality, byte length, checksum); decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each Python worker touches one columnar
batch at a time — the only sane pattern for multi-MB blobs (row UDFs
would pickle each blob individually).

The actual codec step is STUBBED: the runtime image/audio libraries are
not in this container. ``decode_media`` raises NotImplementedError by
design; ``extract_features`` uses a deterministic fake featurizer so the
Spark-side plumbing — schema, batch iteration, partition sizing — is
real and tested (tests/test_multimodal.py). Swapping the fake for
Pillow/torchaudio is a one-function change.

Scale notes: blobs dominate partition size — repartition so
``rows_per_partition × avg_blob`` stays ≪ executor memory, and always
project metadata-only when a stage doesn't need bytes (the schema keeps
metadata in separate columns precisely so column pruning drops the blob).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, "
    "checksum string, feat_mean double, feat_argmax int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-fixture adapter: materialize an opaque binary column (UTF-8
    bytes of the text) + typed metadata, standing in for real media
    ingested from object storage."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("modality"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


def decode_media(payload: bytes, modality: str):
    """REAL CODEC STUB — image/audio decode libraries are not available
    in this environment. Production: dispatch on modality to
    PIL.Image.open / soundfile.read / pyav frame sampling."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "container; use extract_features(fake=True) for plumbing tests"
    )


def _fake_features(payload: bytes) -> tuple[float, int]:
    """Deterministic featurizer over raw bytes (stands in for a model
    forward pass): mean byte value + argmax of a 16-bin byte histogram."""
    if not payload:
        return 0.0, 0
    hist = [0] * 16
    total = 0
    for b in payload:
        hist[b >> 4] += 1
        total += b
    return total / len(payload), max(range(16), key=lambda i: (hist[i], -i))


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow streams column batches into Python; each batch yields one
    output frame — constant memory per worker regardless of table size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_features(p) for p in pdf["payload"]]
            else:  # pragma: no cover — needs codec libs
                feats = [decode_media(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": pdf["checksum"],
                    "feat_mean": [f[0] for f in feats],
                    "feat_argmax": [f[1] for f in feats],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
