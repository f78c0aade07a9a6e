"""Multimodal plumbing tests: schema, determinism, stub boundary, and
feature parity with a pure-Python recompute (FIXTURES.md-independent —
any text source works)."""

from __future__ import annotations

import pytest

from projektdataengineering_spark.catalog import load_table
from projektdataengineering_spark.operators.multimodal import (
    _fake_features,
    attach_binary_payload,
    decode_media,
    extract_features,
)


def test_feature_schema_and_values(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = extract_features(attach_binary_payload(docs), fake=True)
    assert out.columns == [
        "doc_id", "modality", "n_bytes", "checksum", "feat_mean", "feat_argmax",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows.keys() == src.keys()
    for doc_id, text in src.items():
        payload = text.encode("utf-8")
        mean, argmax = _fake_features(payload)
        r = rows[doc_id]
        assert r["n_bytes"] == len(payload)
        assert r["feat_mean"] == pytest.approx(mean)
        assert r["feat_argmax"] == argmax


def test_rerun_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = sorted(map(tuple, extract_features(attach_binary_payload(docs)).collect()))
    b = sorted(map(tuple, extract_features(attach_binary_payload(docs)).collect()))
    assert a == b


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", "image/png")


def test_binary_dir_ingest_feeds_feature_extraction(spark, tmp_path):
    """read_binary_dir (the REAL binaryFile ingest seam) must produce
    the payload+metadata shape extract_features consumes, with sha256
    checksums and modality mapping matching a pure-Python recompute."""
    import hashlib

    from projektdataengineering_spark.operators.multimodal import extract_features
    from projektdataengineering_spark.sources import read_binary_dir

    blobs = {
        "a.jpg": b"\xff\xd8\xff fake jpeg bytes",
        "b.wav": b"RIFF fake wav payload \x00\x01\x02",
        "c.weird": b"unknown extension bytes",
    }
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)

    df = read_binary_dir(spark, str(tmp_path))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(blobs)
    for name, data in blobs.items():
        r = rows[name]
        assert bytes(r["payload"]) == data
        assert r["n_bytes"] == len(data)
        assert r["checksum"] == hashlib.sha256(data).hexdigest()
    assert rows["a.jpg"]["modality"] == "image/jpeg"
    assert rows["b.wav"]["modality"] == "audio/wav"
    assert rows["c.weird"]["modality"] == "application/octet-stream"

    # the downstream featurizer runs unchanged on the ingested frame
    # (it keys on doc_id + payload/modality/n_bytes/checksum)
    from pyspark.sql import functions as F

    feat = extract_features(
        df.select(
            F.xxhash64("path").alias("doc_id"),
            "payload",
            "modality",
            "n_bytes",
            "checksum",
        ),
        fake=True,
    )
    out = feat.collect()
    assert len(out) == 3 and all(r["feat_mean"] > 0 for r in out)

    # metadata-only projection must NOT read the content column
    meta_plan = (
        read_binary_dir(spark, str(tmp_path))
        .select("path", "n_bytes")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "content" not in meta_plan


def test_resize_media_plumbing(spark, sf_dir):
    """resize_media: output payloads are exactly w×h bytes, metadata is
    refreshed (checksum = sha256 of the RESIZED bytes), and the resample
    matches the pure-Python featurizer contract."""
    import hashlib

    from projektdataengineering_spark.operators.multimodal import (
        _fake_resize,
        attach_binary_payload,
        resize_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    src = attach_binary_payload(docs)
    out = resize_media(src, 8, 4).collect()
    assert len(out) == 20
    originals = {r["doc_id"]: bytes(r["payload"]) for r in src.collect()}
    for r in out:
        b = bytes(r["payload"])
        assert len(b) == 8 * 4 == r["n_bytes"]
        assert r["checksum"] == hashlib.sha256(b).hexdigest()
        assert b == _fake_resize(originals[r["doc_id"]], 8, 4)


def test_sample_frames_expansion(spark, sf_dir):
    """sample_frames: 1→N expansion with per-frame metadata; frames are
    the deterministic evenly-spaced slices of the source payload."""
    from projektdataengineering_spark.operators.multimodal import (
        _fake_frames,
        attach_binary_payload,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents").limit(10)
    src = attach_binary_payload(docs)
    out = sample_frames(src, 3).collect()
    assert len(out) == 30
    originals = {r["doc_id"]: bytes(r["payload"]) for r in src.collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["payload"])
    for doc_id, frames in by_doc.items():
        want = _fake_frames(originals[doc_id], 3)
        assert [frames[i] for i in range(3)] == want
