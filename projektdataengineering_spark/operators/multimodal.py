"""Multimodal (image/audio/video) column plumbing.

Design: media travel as opaque ``binary`` columns with typed metadata
(modality, byte length, checksum); decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each Python worker touches one columnar
batch at a time — the only sane pattern for multi-MB blobs (row UDFs
would pickle each blob individually).

The codec step is REAL for all three modalities: ``decode_media``
dispatches to the vendored pure-Python PNG/WAV/uncompressed-AVI codecs
(operators/codecs.py — stdlib zlib/struct/wave, implemented from the
public specs), so ``extract_features(fake=False)`` computes features
from actually-decoded pixels/samples/frames and
``sample_frames(fake=False)`` strides real decoded video frames.
COMPRESSED video (H.26x/VP9) stays a documented NotImplementedError —
those genuinely need native codec libraries this container lacks
(production: pyav keyframe striding behind the same dispatch). The
deterministic fake featurizer is kept for plumbing tests and as the
any-modality fallback (tests/test_multimodal.py covers both paths).

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


def attach_png_payload(df: DataFrame, text_col: str = "text", width: int = 32) -> DataFrame:
    """Fixture adapter producing REAL PNGs: each document's UTF-8 bytes
    are rendered deterministically as a ``width``-pixel-wide greyscale
    image (rows of bytes, zero-padded tail) and PNG-encoded with the
    vendored codec. Downstream decode therefore exercises the full real
    path — signature check, zlib inflate, filter reconstruction — on
    bytes that exist only as a valid image container.

    Runs inside mapInPandas (one Arrow batch per step), keeping the
    same constant-memory worker profile as the decode direction."""
    import hashlib

    import numpy as np

    from .codecs import png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8") or b"\x00"
                h = (len(raw) + width - 1) // width
                arr = np.zeros(h * width, dtype=np.uint8)
                arr[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                payloads.append(png_encode(arr.reshape(h, width)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "modality": "image/png",
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    schema = "doc_id long, payload binary, modality string, n_bytes long, checksum string"
    return df.select("doc_id", text_col).mapInPandas(run, schema=schema)


def attach_avi_payload(
    df: DataFrame,
    text_col: str = "text",
    width: int = 16,
    n_frames: int = 4,
    codec: str = "DIB",
) -> DataFrame:
    """Fixture adapter producing REAL videos: each document's UTF-8
    bytes are chunked into ``n_frames`` RGB frames (width×width pixels,
    zero-padded) and packed into an AVI with the vendored codec —
    downstream decode exercises the full RIFF walk, header parse and
    frame decode on a valid video container. ``codec="MJPG"`` packs
    each frame as a baseline JPEG (operators/jpeg.py) — the
    compressed-video layout; ``codec="mixed"`` alternates DIB/MJPG by
    doc_id parity so one DataFrame exercises both decode paths."""
    import hashlib

    import numpy as np

    from .codecs import avi_encode

    frame_px = width * width * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                raw = (text or "").encode("utf-8") or b"\x00"
                buf = np.zeros(n_frames * frame_px, dtype=np.uint8)
                buf[: min(len(raw), buf.size)] = np.frombuffer(
                    raw[: buf.size], dtype=np.uint8
                )
                c = codec
                if c == "mixed":
                    c = "MJPG" if int(doc_id) % 2 else "DIB"
                payloads.append(
                    avi_encode(buf.reshape(n_frames, width, width, 3), codec=c)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "modality": "video/avi",
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    schema = "doc_id long, payload binary, modality string, n_bytes long, checksum string"
    return df.select("doc_id", text_col).mapInPandas(run, schema=schema)


def decode_media(payload: bytes, modality: str):
    """Decode a media blob by modality.

    * ``image/png`` → uint8 pixel array (h, w[, channels]) via the
      vendored pure-Python PNG decoder (codecs.png_decode);
    * ``audio/wav`` → int16 sample array via stdlib ``wave``
      (codecs.wav_decode);
    * ``video/avi`` → uint8 frame array (n, h, w, 3) via the vendored
      AVI decoder (codecs.avi_decode) — BI_RGB and Motion-JPEG
      streams both decode (MJPG frames through the pure-Python
      baseline JPEG codec, operators/jpeg.py); inter-frame codecs
      raise NotImplementedError there;
    * any other modality → NotImplementedError: inter-frame video
      (H.26x/VP9) needs native libraries this container lacks.
      Production: pyav keyframe striding behind this same dispatch.
    """
    from .codecs import avi_decode, png_decode, wav_decode

    if modality == "image/png":
        return png_decode(payload)
    if modality == "audio/wav":
        return wav_decode(payload)[0]
    if modality == "video/avi":
        return avi_decode(payload)[0]
    raise NotImplementedError(
        f"no decoder for modality {modality!r} in this container "
        "(PNG, WAV, BI_RGB/MJPG AVI decode are real; inter-frame "
        "video codecs need native libraries)"
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


def _intensity_features(vals) -> tuple[float, int]:
    """(mean, 16-bin histogram argmax) over an array of 0..255
    intensities — the one featurizer body shared by the decode path
    (_decoded_features) and the fused frame path (sample_frames with
    features=True), so the two can never drift arithmetically."""
    import numpy as np

    if vals.size == 0:
        return 0.0, 0
    vals = vals.reshape(-1).astype(np.int64)
    hist = np.bincount(vals >> 4, minlength=16)[:16]
    # ties toward the smaller bin, matching _fake_features' key order
    argmax = int(np.argmax(hist))
    return float(vals.mean()), argmax


def _decoded_features(payload: bytes, modality: str) -> tuple[float, int]:
    """REAL featurizer: decode the blob, then the same (mean, 16-bin
    histogram argmax) summary computed over DECODED values — pixel
    intensities for images, |sample| amplitudes rescaled to 0..255 for
    audio — so the feature provably depends on a successful decode, not
    on the container bytes."""
    import numpy as np

    decoded = decode_media(payload, modality)
    vals = np.asarray(decoded)
    if vals.size == 0:
        return 0.0, 0
    if modality == "audio/wav":  # int16 amplitude → 0..255 intensity
        vals = np.minimum(np.abs(vals.astype(np.int64)), 32767) * 255 // 32767
    return _intensity_features(vals)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow streams column batches into Python; each batch yields one
    output frame — constant memory per worker regardless of table size.
    ``fake=False`` runs the REAL decode (PNG/WAV via operators/codecs)
    and featurizes the decoded values.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_features(p) for p in pdf["payload"]]
            else:
                feats = [
                    _decoded_features(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                ]
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

    def _real_resize(payload: bytes, modality: str) -> bytes:
        """Decode → nearest-neighbor resample → re-encode (PNG)."""
        import numpy as np

        from .codecs import png_encode

        img = decode_media(payload, modality)
        img = np.asarray(img)
        h0, w0 = img.shape[:2]
        ys = (np.arange(height) * h0) // height
        xs = (np.arange(width) * w0) // width
        return png_encode(img[ys][:, xs])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                out = [_fake_resize(p, width, height) for p in pdf["payload"]]
            else:
                out = [
                    _real_resize(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                ]
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


def _real_frames(
    payload: bytes, modality: str, n_frames: int
) -> "list[tuple[bytes, object]]":
    """REAL frame sampler: decode the video, pick n_frames at a uniform
    stride (repeating the last frame when the clip is shorter), and
    re-encode each sampled frame as a standalone PNG — the decoded-video
    → image-corpus expansion, every byte passing through real codecs.
    Returns (png_bytes, decoded_frame_array) per sampled frame so a
    fused consumer can featurize the pixels while they are in memory."""
    from .codecs import png_encode

    frames = decode_media(payload, modality)  # (n, h, w, 3)
    total = len(frames)
    picked = [frames[min((k * total) // n_frames, total - 1)] for k in range(n_frames)]
    return [(png_encode(fr), fr) for fr in picked]


FRAME_FEATURES_SCHEMA = FRAME_SCHEMA + ", feat_mean double, feat_argmax int"


def sample_frames(
    df: DataFrame, n_frames: int, fake: bool = True, features: bool = False
) -> DataFrame:
    """Video frame sampling via mapInPandas: each input blob expands to
    n_frames rows (doc_id, frame_idx, frame payload) — the 1→N
    expansion that turns a video corpus into an image corpus for
    training. ``fake=False`` runs the REAL path: uncompressed-AVI
    decode + uniform-stride sampling + per-frame PNG re-encode
    (production swaps the decode for pyav keyframe striding behind the
    same decode_media dispatch).

    ``features=True`` (real path only) additionally emits
    (feat_mean, feat_argmax) computed from the DECODED frame pixels
    while they are in memory — the guide §4.2 fusion (r19): a separate
    extract_features pass would re-decode every frame PNG row-by-row in
    Python just to recompute values this kernel already held. The PNG
    encode→decode roundtrip is lossless and unit-pinned
    (tests/test_multimodal.py), and the featurizer body is the SAME
    _intensity_features the decode path runs, so the fused columns are
    bit-identical to extract_features(fake=False) over the emitted
    payloads — asserted by test_sample_frames_fused_features_match.

    Scale: output rows = input rows × n_frames and output bytes can
    EXCEED input bytes (decoded frames vs compressed video) — the one
    media stage where you must repartition AFTER expansion; metadata
    stays per-frame so column pruning spares the bytes downstream."""
    import hashlib

    import numpy as np

    if features and fake:
        raise ValueError("features=True requires the real path (fake=False)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "modality": [], "frame_idx": [],
                "payload": [], "n_bytes": [], "checksum": [],
            }
            if features:
                rows["feat_mean"] = []
                rows["feat_argmax"] = []
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                frames = (
                    [(fr, None) for fr in _fake_frames(payload, n_frames)]
                    if fake
                    else _real_frames(payload, modality, n_frames)
                )
                for k, (fr, arr) in enumerate(frames):
                    rows["doc_id"].append(doc_id)
                    # the real path re-encodes sampled frames as PNGs —
                    # the output modality reflects the frame container
                    rows["modality"].append(modality if fake else "image/png")
                    rows["frame_idx"].append(k)
                    rows["payload"].append(fr)
                    rows["n_bytes"].append(len(fr))
                    rows["checksum"].append(hashlib.sha256(fr).hexdigest())
                    if features:
                        mean, argmax = _intensity_features(np.asarray(arr))
                        rows["feat_mean"].append(mean)
                        rows["feat_argmax"].append(argmax)
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, schema=FRAME_FEATURES_SCHEMA if features else FRAME_SCHEMA
    )


def attach_wav_payload(
    df: DataFrame, text_col: str = "text", rate: int = 16000, n_samples: int = 1600
) -> DataFrame:
    """Fixture adapter producing REAL audio: each document's UTF-8
    bytes become a deterministic 16-bit PCM waveform (bytes scaled to
    int16 centered on zero, zero-padded/truncated to ``n_samples``)
    and WAV-encoded with the vendored codec — downstream decode
    exercises the full RIFF/fmt/data walk on a valid audio container.
    0.1 s @ 16 kHz per doc keeps the fixture worker-memory-bounded;
    a real corpus would carry multi-MB clips with the same schema."""
    import hashlib

    import numpy as np

    from .codecs import wav_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8") or b"\x00"
                buf = np.zeros(n_samples, dtype=np.int16)
                take = min(len(raw), n_samples)
                # bytes 0..255 → int16 −16384..16256 (×128, −16384)
                buf[:take] = (
                    np.frombuffer(raw[:take], dtype=np.uint8).astype(np.int16)
                    * 128
                    - 16384
                )
                payloads.append(wav_encode(buf, rate=rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "modality": "audio/wav",
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    schema = "doc_id long, payload binary, modality string, n_bytes long, checksum string"
    return df.select("doc_id", text_col).mapInPandas(run, schema=schema)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched audio featurization over DECODED samples: peak
    amplitude, integer sum of squares (energy — exact, no float fold),
    zero-crossing count, duration. The audio analogue of
    extract_features(fake=False): every value is a deterministic
    integer function of the decoded PCM, so tests can pin them against
    a pure-python recompute of the same waveform."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import wav_decode

        for pdf in batches:
            peak, energy, zc, n_samp, rate_out = [], [], [], [], []
            for payload in pdf["payload"]:
                samples, rate = wav_decode(bytes(payload))
                s = samples.astype(np.int64).ravel()
                peak.append(int(np.abs(s).max()) if s.size else 0)
                energy.append(int((s * s).sum()))
                zc.append(int(np.count_nonzero(np.diff(np.signbit(s)))))
                n_samp.append(int(s.size))
                rate_out.append(int(rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": pdf["checksum"],
                    "peak": peak,
                    "energy": energy,
                    "zero_crossings": zc,
                    "n_samples": n_samp,
                    "sample_rate": rate_out,
                }
            )

    schema = (
        "doc_id long, modality string, n_bytes long, checksum string, "
        "peak long, energy long, zero_crossings long, n_samples long, "
        "sample_rate long"
    )
    return df.mapInPandas(run, schema=schema)


PHASH_SCHEMA = "doc_id long, n_rows long, dhash string, ahash string"


def image_perceptual_hashes(df: DataFrame) -> DataFrame:
    """Perceptual image hashes over REAL PNG decodes (mapInPandas):
    dHash (Krawetz's public difference hash — 8×9 nearest-neighbor
    sample grid, bit = left pixel > right pixel) and aHash (8×8 grid,
    bit = pixel > global raster mean), each packed msb-first into 16
    lowercase hex chars.

    Every step is pure integer arithmetic on decoded pixels —
    nearest-neighbor sampling at ((2r+1)·H)//16 × ((2c+1)·W)//18 (resp.
    //16), strict ``>`` comparisons, and the mean test cross-multiplied
    as pixel·n_pix > total_sum — so the hash is an exact function of
    the decoded raster and a SQL oracle can replay it from the
    encode-side bytes (the decoded-domain certification discipline of
    queries/multimodal.py)."""
    import numpy as np

    def _hashes(payload: bytes, modality: str) -> tuple[int, str, str]:
        arr = np.asarray(decode_media(payload, modality), dtype=np.int64)
        if arr.ndim == 1:  # degenerate single-row raster
            arr = arr.reshape(1, -1)
        h, w = arr.shape[0], arr.shape[1]
        dbits = 0
        for r in range(8):
            row = ((2 * r + 1) * h) // 16
            for c in range(8):
                a = arr[row, ((2 * c + 1) * w) // 18]
                b = arr[row, ((2 * (c + 1) + 1) * w) // 18]
                if a > b:
                    dbits |= 1 << (63 - (r * 8 + c))
        total = int(arr.sum())
        n_pix = h * w
        abits = 0
        for r in range(8):
            row = ((2 * r + 1) * h) // 16
            for c in range(8):
                v = arr[row, ((2 * c + 1) * w) // 16]
                if v * n_pix > total:
                    abits |= 1 << (63 - (r * 8 + c))
        return h, f"{dbits:016x}", f"{abits:016x}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _hashes(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_rows": [o[0] for o in out],
                    "dhash": [o[1] for o in out],
                    "ahash": [o[2] for o in out],
                }
            )

    return df.mapInPandas(run, schema=PHASH_SCHEMA)
