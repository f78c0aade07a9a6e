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


RESIZE_SCHEMA = (
    "doc_id long, modality string, width int, height int, "
    "payload binary, n_bytes long, checksum string"
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resample: width×height bytes
    sampled from the payload at evenly-spaced offsets (nearest-neighbor
    over the byte stream). Preserves the real op's contract — output
    size is a pure function of (width, height), content a pure function
    of the input bytes — so partitioning/memory behavior is faithful."""
    n = width * height
    if not payload:
        return bytes(n)
    step = len(payload) / n
    return bytes(payload[int(i * step)] for i in range(n))


def resize_media(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize over binary payloads via mapInPandas — the second
    stage of the media pipeline (decode → RESIZE → featurize).
    Production swaps _fake_resize for PIL `Image.resize` after
    decode_media; the stub boundary is the same one extract_features
    documents. Output payloads are width×height bytes with refreshed
    n_bytes/sha256 metadata (the checksum change is how lineage tells
    a derived asset from its source — reference R11's checksum idea).

    Scale: output partition bytes ≈ rows × width × height — resize
    SHRINKS partitions for thumbnailing (the common case); repartition
    AFTER enlarging resizes, before is wasted shuffle."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                out = [_fake_resize(p, width, height) for p in pdf["payload"]]
            else:  # pragma: no cover — needs codec libs
                out = [decode_media(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "width": width,
                    "height": height,
                    "payload": out,
                    "n_bytes": [len(b) for b in out],
                    "checksum": [hashlib.sha256(b).hexdigest() for b in out],
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, modality string, frame_idx int, "
    "payload binary, n_bytes long, checksum string"
)


def _fake_frames(payload: bytes, n_frames: int, frame_bytes: int = 64) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: n_frames
    evenly-spaced fixed-size byte slices (zero-padded at the tail) —
    the uniform-stride sampling policy every video curriculum uses."""
    if not payload:
        return [bytes(frame_bytes)] * n_frames
    out = []
    for k in range(n_frames):
        start = (k * len(payload)) // n_frames
        chunk = payload[start : start + frame_bytes]
        out.append(chunk + bytes(frame_bytes - len(chunk)))
    return out


def sample_frames(df: DataFrame, n_frames: int, fake: bool = True) -> DataFrame:
    """Video frame sampling via mapInPandas: each input blob expands to
    n_frames rows (doc_id, frame_idx, frame payload) — the 1→N
    expansion that turns a video corpus into an image corpus for
    training. Production replaces _fake_frames with pyav keyframe
    striding behind the decode_media stub boundary.

    Scale: output rows = input rows × n_frames and output bytes can
    EXCEED input bytes (decoded frames vs compressed video) — the one
    media stage where you must repartition AFTER expansion; metadata
    stays per-frame so column pruning spares the bytes downstream."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "modality": [], "frame_idx": [],
                "payload": [], "n_bytes": [], "checksum": [],
            }
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                frames = (
                    _fake_frames(payload, n_frames)
                    if fake
                    else decode_media(payload, modality)  # pragma: no cover
                )
                for k, fr in enumerate(frames):
                    rows["doc_id"].append(doc_id)
                    rows["modality"].append(modality)
                    rows["frame_idx"].append(k)
                    rows["payload"].append(fr)
                    rows["n_bytes"].append(len(fr))
                    rows["checksum"].append(hashlib.sha256(fr).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
