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
