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


def _png_full(w, h, pixels, channels=3, filters=None):
    """Minimal real PNG encoder for tests: 8-bit, per-row filter types
    (cycling through `filters`) so every unfilter branch of decode_png
    is exercised.  `pixels` is raw row-major bytes, len == w*h*channels."""
    import struct, zlib

    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    filters = filters or [0]
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (enc[i] - line[i - channels]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (prev[i] if pb <= pc else c)
                enc[i] = (enc[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp_full(w, h, rgb):
    """Minimal real 24-bit BMP encoder (bottom-up, BGR, 4-byte padded
    rows); `rgb` is top-down row-major RGB bytes."""
    import struct

    row_sz = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = rgb[(y * w + x) * 3 : (y * w + x) * 3 + 3]
            body += bytes([b, g, r])
        body += b"\x00" * (row_sz - w * 3)
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + bytes(body)


def _gradient(w, h, channels):
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(channels)
    )


def test_decode_png_roundtrip_all_filters():
    from clickhub_spark.operators.multimodal import decode_png

    for channels in (1, 2, 3, 4):
        px = _gradient(9, 7, channels)
        blob = _png_full(9, 7, px, channels, filters=[0, 1, 2, 3, 4])
        assert decode_png(blob) == (9, 7, channels, px)


def test_decode_bmp_roundtrip():
    from clickhub_spark.operators.multimodal import decode_bmp

    px = _gradient(5, 4, 3)
    assert decode_bmp(_bmp_full(5, 4, px)) == (5, 4, 3, px)


def test_real_decode_pixel_stats_and_fallback():
    import math

    from clickhub_spark.operators.multimodal import real_decode

    px = _gradient(8, 8, 3)
    feat = real_decode(_png_full(8, 8, px, 3, filters=[4]))
    mean = sum(px) / len(px)
    assert feat[:3] == [8.0, 8.0, 3.0]
    assert abs(feat[3] - round(mean / 255.0, 6)) < 1e-9
    sd = math.sqrt(sum((v - mean) ** 2 for v in px) / len(px))
    assert abs(feat[4] - round(sd / 255.0, 6)) < 1e-9
    assert feat[5] == round(min(px) / 255.0, 6)
    assert feat[6] == round(max(px) / 255.0, 6)
    # same image as BMP → identical pixel stats
    assert real_decode(_bmp_full(8, 8, px)) == feat
    # non-image payloads keep the deterministic byte-stat stub
    assert real_decode(b"plain text") == stub_decode(b"plain text")


def _wav(rate, samples16, channels=1):
    """Minimal real PCM WAV encoder (16-bit signed)."""
    import struct

    data = struct.pack(f"<{len(samples16)}h", *samples16)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_roundtrip_and_features():
    import math

    from clickhub_spark.operators.multimodal import (
        decode_wav,
        probe_audio,
        real_decode,
    )

    # one full cycle of a 1 kHz square-ish wave at 8 kHz
    samples = [16384 if (i // 4) % 2 == 0 else -16384 for i in range(8000)]
    blob = _wav(8000, samples)
    rate, ch, s = decode_wav(blob)
    assert (rate, ch, len(s)) == (8000, 1, 8000)
    assert abs(s[0] - 0.5) < 1e-4 and abs(s[4] + 0.5) < 1e-4
    assert probe_audio(blob) == ("wav", 8000, 1, 8000)
    feat = real_decode(blob)
    assert feat[:3] == [8000.0, 1.0, 8000.0]
    assert abs(feat[3] - 0.5) < 1e-3          # rms of a ±0.5 square wave
    assert abs(feat[4] - 0.5) < 1e-3          # peak
    assert abs(feat[5] - 0.25) < 1e-2         # zero crossings every 4 samples
    assert abs(feat[7] - 1.0) < 1e-6          # 1 second
    assert not math.isnan(feat[6])
    # malformed/unsupported WAVs fall back to the byte-stat stub
    assert real_decode(blob[:30]) == stub_decode(blob[:30])


def test_extract_features_real_png_in_dataframe(spark):
    """End-to-end: real PNG bytes through the mapInPandas extraction —
    the decode contract running distributed, not just in-process."""
    px = _gradient(6, 5, 3)
    rows = [(1, bytearray(_png_full(6, 5, px, 3, filters=[1, 2])), ("img/png", 99)),
            (2, bytearray(b"not an image"), ("utf8-text", 12))]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, media_meta struct<media_type:string,n_bytes:int>",
    )
    got = {r.doc_id: r.feat for r in extract_features(df).collect()}
    assert got[1][:3] == [6.0, 5.0, 3.0]
    assert abs(sum(got[2]) - 1.0) < 1e-3  # stub path normalizes


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


def test_encode_wav_roundtrip():
    from clickhub_spark.operators.multimodal import decode_wav, encode_wav

    pcm = bytes(range(256)) * 2  # 8-bit mono, even length
    blob = encode_wav(4000, 1, 8, pcm)
    rate, ch, s = decode_wav(blob)
    assert (rate, ch, len(s)) == (4000, 1, 512)
    # odd-length data chunk gets the RIFF pad byte, still decodes
    blob_odd = encode_wav(4000, 1, 8, pcm[:255])
    assert len(blob_odd) % 2 == 0
    assert len(decode_wav(blob_odd)[2]) == 255


def test_sample_frames_real_wav_path(spark):
    """WAV payloads take the REAL path: sample-aligned PCM windows,
    each re-encoded as a standalone decodable WAV with the source's
    rate/channels/depth; non-WAV payloads keep the raw-window stub."""
    from clickhub_spark.operators.multimodal import decode_wav

    samples = list(range(-60, 60))  # 120 16-bit samples = 240 PCM bytes
    wav = _wav(8000, samples)
    rows = [(1, bytearray(wav)), (2, bytearray(b"0123456789abcdef" * 8))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(df, every_nth=2, max_frames=3, frame_sz=32).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, {})[r.frame_idx] = bytes(r.frame)
    # WAV: 240 bytes / 32 = 7 windows → sampled 0, 2, 4
    assert sorted(got[1]) == [0, 2, 4]
    for f, frame in got[1].items():
        rate, ch, s = decode_wav(frame)  # standalone playable WAV
        assert (rate, ch, len(s)) == (8000, 1, 16)
        assert [round(v * 32768) for v in s] == samples[f * 16 : f * 16 + 16]
    # non-WAV: raw 32-byte windows at stub indices
    assert sorted(got[2]) == [0, 2]
    assert got[2][0] == b"0123456789abcdef" * 2


def test_sample_frames_alignment_and_corrupt_fallback(spark):
    """frame_sz snaps down to the sample block size (16-bit stereo =
    4 bytes); a corrupt-after-probe WAV falls back to the stub instead
    of killing the task."""
    from clickhub_spark.operators.multimodal import sample_wav_frames, decode_wav

    samples = list(range(48))  # 24 stereo frames, 96 PCM bytes
    wav = _wav(16000, samples, channels=2)
    out = sample_wav_frames(wav, every_nth=1, max_frames=99, frame_sz=10)
    # 10 → 8 (two stereo 16-bit sample-frames per window): 96/8 = 12
    assert len(out) == 12
    assert all(len(decode_wav(w)[2]) == 4 for _, w in out)
    truncated = bytearray(wav[:30])  # RIFF/WAVE magic intact, chunks cut
    df = spark.createDataFrame([(1, truncated)], "doc_id long, payload binary")
    rows = sample_frames(df, every_nth=1, max_frames=2, frame_sz=16).collect()
    assert all(len(r.frame) == 16 for r in rows)  # stub path, no crash


def _gif_lzw_encode(min_code_size, indices):
    """Minimal valid GIF LZW stream: CLEAR before every few literal
    codes so the code width never grows — decoders must handle it."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    bits, acc, nacc = bytearray(), 0, 0

    def emit(code, size):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += size
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear, code_size)
    for j, idx in enumerate(indices):
        if j and j % 2 == 0:
            emit(clear, code_size)  # reset so width stays constant
        emit(idx, code_size)
    emit(end, code_size)
    if nacc:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _gif_full(w, h, indices, palette, interlace=False):
    """`indices` is always display (top-down) row order; with
    ``interlace`` the encoder emits rows in GIF 4-pass order and sets
    the descriptor flag, so decode must de-interlace to round-trip."""
    import struct
    n = max(2, len(palette))
    depth = max(1, (n - 1).bit_length())
    gct = b"".join(bytes(c) for c in palette) + b"\x00" * 3 * ((1 << depth) - len(palette))
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0) + gct
    if interlace:
        order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(start, h, step)]
        indices = [v for y in order for v in indices[y * w : (y + 1) * w]]
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    mcs = max(2, depth)
    data = _gif_lzw_encode(mcs, indices)
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00\x3b"


def test_decode_gif_roundtrip_and_real_paths():
    from clickhub_spark.operators.multimodal import (
        decode_gif, decode_bmp, real_decode, real_resize, stub_decode,
    )

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    indices = [0, 1, 2, 3]  # 2x2, one pixel per color
    gif = _gif_full(2, 2, indices, palette)
    w, h, ch, px = decode_gif(gif)
    assert (w, h, ch) == (2, 2, 3)
    got = [tuple(px[i * 3 : i * 3 + 3]) for i in range(4)]
    assert got == palette
    # real_decode routes GIF to pixel stats (first feat = width)
    assert real_decode(gif)[:3] == [2.0, 2.0, 3.0]
    # real_resize: GIF → decode → nn-resample → BMP, decodable back
    bw, bh, _, brgb = decode_bmp(real_resize(gif, 4, 4))
    assert (bw, bh) == (4, 4)
    assert tuple(brgb[:3]) == palette[0]  # top-left block keeps pixel 0
    # corrupt-after-probe GIF falls back to the stub, never raises
    assert real_decode(gif[:14]) == stub_decode(gif[:14])


def test_decode_gif_interlaced_roundtrip():
    """4-pass interlaced stream de-interlaces to the display image:
    10 rows exercise all four passes (rows 0,8 / 4 / 2,6 / odd)."""
    from clickhub_spark.operators.multimodal import decode_gif

    palette = [(i * 16, 255 - i * 16, i * 7) for i in range(10)]
    w, h = 3, 10
    indices = [y for y in range(h) for _ in range(w)]  # row y = color y
    plain = decode_gif(_gif_full(w, h, indices, palette))
    inter = decode_gif(_gif_full(w, h, indices, palette, interlace=True))
    assert inter == plain
    _, _, _, px = inter
    for y in range(h):  # every display row holds its own palette color
        row = px[y * w * 3 : (y + 1) * w * 3]
        assert row == bytes(palette[y]) * w


def test_decode_png_adam7_roundtrip():
    """Adam7 PNG: 7 independently-filtered sub-images scatter back to
    the sequential image; 9x10 hits every pass with non-empty dims,
    and mixed per-row filters exercise unfiltering inside passes."""
    from clickhub_spark.operators.multimodal import decode_png

    w, h, channels = 9, 10, 3
    pixels = bytes((x * 29 + y * 53 + c * 17) & 0xFF
                   for y in range(h) for x in range(w) for c in range(channels))
    seq = decode_png(_png_full(w, h, pixels, channels))
    adam = decode_png(_png_adam7(w, h, pixels, channels, filters=[0, 1, 2, 3, 4]))
    assert adam == seq == (w, h, channels, pixels)
    # 1x1: only pass 1 is non-empty — the empty-pass path must not
    # consume phantom filter bytes
    one = bytes([7, 8, 9])
    assert decode_png(_png_adam7(1, 1, one, 3)) == (1, 1, 3, one)


def _png_adam7(w, h, pixels, channels=3, filters=None):
    """Adam7 encoder for tests: extract the 7 pass sub-images from
    row-major `pixels`, filter each independently (cycling `filters`),
    concatenate, deflate — the exact stream layout decode_png must
    parse."""
    import struct, zlib

    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    filters = filters or [0]
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = pw * channels
        prev = bytes(stride)
        for py in range(ph):
            y = y0 + py * dy
            line = bytearray()
            for px_i in range(pw):
                x = x0 + px_i * dx
                line += pixels[(y * w + x) * channels : (y * w + x + 1) * channels]
            f = filters[py % len(filters)]
            enc = bytearray(line)
            if f == 1:
                for i in range(stride - 1, channels - 1, -1):
                    enc[i] = (enc[i] - line[i - channels]) & 0xFF
            elif f == 2:
                for i in range(stride):
                    enc[i] = (enc[i] - prev[i]) & 0xFF
            elif f == 3:
                for i in range(stride):
                    left = line[i - channels] if i >= channels else 0
                    enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
            elif f == 4:
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    c = prev[i - channels] if i >= channels else 0
                    p = a + prev[i] - c
                    pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (prev[i] if pb <= pc else c)
                    enc[i] = (enc[i] - pred) & 0xFF
            raw += bytes([f]) + bytes(enc)
            prev = bytes(line)

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_decode_gif_kwkwk_and_dictionary_growth():
    """A real compressed stream (no periodic CLEAR) exercises
    dictionary growth including the KwKwK self-reference case."""
    from clickhub_spark.operators.multimodal import _lzw_decode

    # encode "0 0 0 0 0" with true LZW, min_code_size=2:
    # CLEAR(4), 0, then code 6 (="0 0": KwKwK at decode), 0, END(5)
    def emit_stream(codes, code_size):
        acc = nacc = 0
        out = bytearray()
        for c in codes:
            acc |= c << nacc
            nacc += code_size
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            out.append(acc & 0xFF)
        return bytes(out)

    data = emit_stream([4, 0, 6, 0, 5], 3)
    assert _lzw_decode(2, data) == [0, 0, 0, 0]


def _checker_rgb(w, h):
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = [
                int(255 * x / w),
                int(255 * y / h),
                255 if (x // 4 + y // 4) % 2 else 0,
            ]
    return img


def test_jpeg_roundtrip_444_and_420():
    """Own-codec JPEG round trips: 4:4:4 and 4:2:0, odd dimensions,
    PSNR must clear 30 dB (4:4:4) / 28 dB (subsampled chroma)."""
    import numpy as np

    from clickhub_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = _checker_rgb(37, 23)
    for sub, floor in ((False, 30.0), (True, 28.0)):
        payload = encode_jpeg(37, 23, 3, img.tobytes(), quality=90, subsample=sub)
        w, h, ch, px = decode_jpeg(payload)
        assert (w, h, ch) == (37, 23, 3)
        dec = np.frombuffer(px, dtype=np.uint8).reshape(23, 37, 3).astype(float)
        mse = ((dec - img.astype(float)) ** 2).mean()
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > floor, (sub, psnr)


def test_jpeg_grayscale_and_probe():
    import numpy as np

    from clickhub_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from clickhub_spark.operators.multimodal import probe_image

    g = (np.outer(np.arange(16), np.ones(24)) * 15).astype(np.uint8)
    payload = encode_jpeg(24, 16, 1, g.tobytes(), quality=85)
    assert probe_image(payload) == ("jpeg", 24, 16)
    w, h, ch, px = decode_jpeg(payload)
    assert (w, h, ch) == (24, 16, 1)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(16, 24).astype(float)
    assert 10 * np.log10(255**2 / max(((dec - g) ** 2).mean(), 1e-9)) > 35


def test_jpeg_through_real_decode_and_resize():
    """The multimodal dispatch must route JPEG payloads through the
    real codec: features carry true dimensions, resize emits a BMP of
    the target size, and a truncated stream falls back to the stub
    instead of raising."""
    from clickhub_spark.operators.jpeg import encode_jpeg
    from clickhub_spark.operators.multimodal import (
        decode_bmp,
        real_decode,
        real_resize,
        stub_decode,
    )

    img = _checker_rgb(40, 24)
    payload = encode_jpeg(40, 24, 3, img.tobytes(), quality=90)
    feats = real_decode(payload)
    assert feats[0] == 40.0 and feats[1] == 24.0 and feats[2] == 3.0
    out = real_resize(payload, 16, 12)
    w, h, ch, px = decode_bmp(out)
    assert (w, h) == (16, 12) and len(px) == 16 * 12 * 3
    truncated = payload[: len(payload) // 2]
    assert real_decode(truncated) == stub_decode(truncated)


def test_jpeg_corruption_never_escapes_catch_tuple():
    """Byte-level corruption fuzz: every decode failure must raise
    within the multimodal dispatch's catch tuple (ValueError /
    IndexError / KeyError / struct.error / zlib.error) so one bad
    blob can never kill a mapInPandas task."""
    import struct
    import zlib

    import numpy as np

    from clickhub_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.random.default_rng(7).integers(0, 255, (16, 16, 3), dtype=np.uint8)
    good = encode_jpeg(16, 16, 3, img.tobytes())
    catch = (ValueError, IndexError, KeyError, struct.error, zlib.error)
    for i in range(2, len(good), 7):
        for b in (0x00, 0xFF, 0xD3):
            corrupt = good[:i] + bytes([b]) + good[i + 1 :]
            try:
                decode_jpeg(corrupt)
            except catch:
                pass  # the contract: these are handled upstream


def test_degenerate_payloads_never_kill_the_task():
    # round-6 review: NULL payloads, 0x0 images, and 0-channel WAVs
    # used to escape the dispatch catch (NotImplementedError /
    # ZeroDivisionError) and abort the mapInPandas task
    from clickhub_spark.operators.multimodal import (
        encode_bmp,
        encode_wav,
        real_decode,
        real_resize,
    )

    assert real_decode(None) == [0.0] * 8
    assert real_resize(None) == b""
    feats = real_decode(encode_bmp(0, 0, b""))
    assert feats[:3] == [0.0, 0.0, 3.0]
    wav = encode_wav(8000, 1, 8, b"\x80" * 8)
    zero_ch = wav.replace(
        (1).to_bytes(2, "little") + (8000).to_bytes(4, "little"),
        (0).to_bytes(2, "little") + (8000).to_bytes(4, "little"),
        1,
    )
    assert len(real_decode(zero_ch)) == 8  # byte-stat fallback, no crash
