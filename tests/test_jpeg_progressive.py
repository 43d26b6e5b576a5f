"""Progressive JPEG (SOF2): the progressive encoder reorders the SAME
quantized coefficients baseline transmits, so decode(progressive) must
equal decode(baseline) byte-for-byte at the same quality — pinning
spectral selection, successive approximation (DC+AC first/refine), EOB
runs, and correction-bit sweeps in one equality."""

import numpy as np
import pytest

from clickhub_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _img(w, h, ch, seed):
    rng = np.random.default_rng(seed)
    # mix smooth gradients (realistic spectra) with noise (dense ACs)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 5) % 256
    img = np.stack([(base + 40 * c) % 256 for c in range(ch)], axis=-1)
    img = (0.7 * img + 0.3 * rng.integers(0, 256, (h, w, ch))).astype(np.uint8)
    return img.tobytes()


@pytest.mark.parametrize("w,h,ch", [(24, 16, 3), (23, 17, 3), (16, 8, 1), (9, 13, 1)])
def test_progressive_equals_baseline(w, h, ch):
    px = _img(w, h, ch, seed=w * 100 + h * 10 + ch)
    base = decode_jpeg(encode_jpeg(w, h, ch, px, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, ch, px, quality=85))
    assert prog == base


def test_progressive_flat_image_exercises_eob_runs():
    # constant image -> every AC band is zero -> the whole AC-first
    # scan is one EOBn run spanning all blocks (run-length > 1 path)
    w, h = 64, 48
    px = bytes([77]) * (w * h * 3)
    base = decode_jpeg(encode_jpeg(w, h, 3, px, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, 3, px, quality=85))
    assert prog == base
    wb, hb, cb, pxb = base
    assert (wb, hb, cb) == (w, h, 3)


def test_progressive_quality_sweep():
    w, h = 17, 11
    px = _img(w, h, 3, seed=7)
    for q in (35, 60, 95):
        assert decode_jpeg(encode_jpeg_progressive(w, h, 3, px, q)) == decode_jpeg(
            encode_jpeg(w, h, 3, px, q)
        )


def test_progressive_stream_is_sof2_multiscans():
    px = _img(16, 16, 3, seed=3)
    payload = encode_jpeg_progressive(16, 16, 3, px)
    assert b"\xff\xc2" in payload  # SOF2
    # 1 DC first + 3 comps x 2 AC-first bands + 2 refine passes x 3
    # comps + 1 DC refine = 14 scans (entropy bytes can't fake a
    # marker: 0xFF is always stuffed to 0xFF00)
    assert payload.count(b"\xff\xda") == 14


def test_real_decode_dispatch_handles_progressive():
    # the multimodal feature extractor used to fall back to the
    # byte-stat stub on SOF2 payloads; now it decodes them for real
    # and must produce the same features as the baseline encoding
    from clickhub_spark.operators.multimodal import real_decode

    px = _img(24, 16, 3, seed=11)
    f_base = real_decode(encode_jpeg(24, 16, 3, px))
    f_prog = real_decode(encode_jpeg_progressive(24, 16, 3, px))
    assert f_prog == f_base
    assert f_prog[:3] == [24, 16, 3]  # real dims, not stub byte stats


def test_finish_planes_non_divisor_sampling():
    # T.81 permits factor pairs like luma 3x3 / chroma 2x2 whose ratio
    # is not an integer; the index-mapped upsample must produce
    # full-size planes where np.repeat's floor-division used to raise
    from clickhub_spark.operators.jpeg import _finish_planes

    h, w = 24, 24  # one 3x3-luma MCU
    luma = np.arange(h * w, dtype=float).reshape(h, w)
    chroma = np.full((16, 16), 128.0)  # 2x2 sampling -> 2/3 resolution
    comps = [
        {"h": 3, "v": 3, "tq": 0},
        {"h": 2, "v": 2, "tq": 1},
        {"h": 2, "v": 2, "tq": 1},
    ]
    out_w, out_h, ch, px = _finish_planes(
        [luma, chroma, chroma], comps, w, h, 3, 3
    )
    assert (out_w, out_h, ch) == (w, h, 3)
    assert len(px) == w * h * 3
    # neutral chroma (128) -> output equals clipped luma in every band
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    expect = np.clip(luma, 0, 255).astype(np.uint8)
    assert (img[..., 0] == expect).all()


def test_finish_planes_divisor_sampling_unchanged():
    # the index-mapped form must equal np.repeat replication for the
    # common 4:2:0 case (regression guard for the rewrite)
    from clickhub_spark.operators.jpeg import _finish_planes

    h, w = 16, 16
    luma = np.zeros((16, 16))
    rng = np.random.default_rng(5)
    chroma = rng.integers(0, 256, (8, 8)).astype(float)
    comps = [
        {"h": 2, "v": 2, "tq": 0},
        {"h": 1, "v": 1, "tq": 1},
        {"h": 1, "v": 1, "tq": 1},
    ]
    _, _, _, px = _finish_planes([luma, chroma, chroma], comps, w, h, 2, 2)
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    rep = np.repeat(np.repeat(chroma, 2, axis=0), 2, axis=1)
    # blue channel = y + 1.772*(cb-128); y=0 here
    expect = np.clip(1.772 * (rep - 128.0), 0, 255).astype(np.uint8)
    assert (img[..., 2] == expect).all()


def test_uniform_table_256_symbols_splits_lengths():
    """ADVICE r6: 256 distinct symbols (the theoretical AC run/size
    max) must not overflow the single-byte DHT count — the table
    splits one symbol onto the next code length and stays a valid,
    round-trippable canonical Huffman table."""
    from clickhub_spark.operators.jpeg import _huff_codes, _uniform_table

    bits, vals = _uniform_table(set(range(256)))
    assert sum(bits) == 256 and len(vals) == 256
    assert all(0 <= b <= 255 for b in bits)
    bytes(bits)  # the serialization that used to raise ValueError
    codes = _huff_codes(bits, vals)
    assert len(codes) == 256
    # prefix-free: no code is a prefix of another
    as_bits = {format(c, f"0{l}b") for c, l in codes.values()}
    assert len(as_bits) == 256
    ordered = sorted(as_bits)
    for a, b in zip(ordered, ordered[1:]):
        assert not b.startswith(a)
