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


def _png(w, h):
    import struct, zlib
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def _jpeg(w, h):
    import struct
    # SOI + APP0 stub + SOF0 frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JF\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def _gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h)


def _bmp(w, h):
    import struct
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 8


def test_probe_image_parses_real_headers():
    from clickhub_spark.operators.multimodal import probe_image

    assert probe_image(_png(640, 480)) == ("png", 640, 480)
    assert probe_image(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert probe_image(_gif(13, 37)) == ("gif", 13, 37)
    assert probe_image(_bmp(800, 600)) == ("bmp", 800, 600)
    assert probe_image(b"not an image at all") == (None, -1, -1)
    assert probe_image(None) == (None, -1, -1)


def test_probe_images_dataframe_triage(spark):
    """The distributed triage pass: mixed real formats + junk in one
    binary column, pruning columns out the other side."""
    from clickhub_spark.operators.multimodal import probe_images

    rows = [
        (1, bytearray(_png(640, 480))),
        (2, bytearray(_jpeg(100, 200))),
        (3, bytearray(_gif(4, 5))),
        (4, bytearray(b"garbage bytes here")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.img_format, r.width, r.height) for r in probe_images(df).collect()}
    assert got == {
        1: ("png", 640, 480),
        2: ("jpeg", 100, 200),
        3: ("gif", 4, 5),
        4: (None, -1, -1),
    }
