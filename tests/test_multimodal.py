"""Multimodal plumbing: binary payload + metadata columns + Arrow
mapInPandas feature extraction with a stubbed decoder."""

import pytest

from clickhub_spark.catalog import load
from clickhub_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    resize_images,
    sample_frames,
    stub_decode,
    stub_resize,
)

from tests.conftest import SF_DIR


def test_payload_and_metadata(spark):
    df = attach_binary_payload(load(spark, SF_DIR, "documents").limit(20))
    row = df.select("payload", "media_meta.*", "n_chars").first()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.n_bytes == row.n_chars  # ascii text → bytes == chars
    assert row.media_type == "utf8-text"


def test_extract_features_schema_and_determinism(spark):
    docs = attach_binary_payload(load(spark, SF_DIR, "documents").limit(50))
    feats = extract_features(docs, batch_partitions=4)
    assert feats.columns == ["doc_id", "media_type", "n_bytes", "feat"]
    rows1 = {r.doc_id: r.feat for r in feats.collect()}
    rows2 = {r.doc_id: r.feat for r in extract_features(docs).collect()}
    assert rows1 == rows2  # deterministic across partitionings
    feat = next(iter(rows1.values()))
    assert len(feat) == 8
    assert abs(sum(feat) - 1.0) < 1e-3  # stub normalizes


def test_stub_decode_contract():
    assert stub_decode(b"abc") == stub_decode(b"abc")
    with pytest.raises(NotImplementedError):
        stub_decode(None)


def test_resize_contract(spark):
    docs = attach_binary_payload(load(spark, SF_DIR, "documents").limit(10))
    out = resize_images(docs, width=16, height=16)
    rows = out.collect()
    assert out.columns == ["doc_id", "resized", "width", "height"]
    assert all(len(r.resized) == 16 * 16 // 8 for r in rows)
    assert stub_resize(b"xy", 16, 16) == stub_resize(b"xy", 16, 16)


def test_frame_sampling_one_to_many(spark):
    docs = attach_binary_payload(load(spark, SF_DIR, "documents").limit(10))
    frames = sample_frames(docs, every_nth=2, max_frames=3)
    rows = frames.collect()
    assert frames.columns == ["doc_id", "frame_idx", "frame"]
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(1 <= len(v) <= 3 for v in per_doc.values())
    assert all(idx % 2 == 0 for v in per_doc.values() for idx in v)
    assert all(len(r.frame) == 16 for r in rows)
