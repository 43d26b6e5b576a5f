"""Multimodal column operators (north star): image/audio/video
payloads as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` UDFs.

Media decode is REAL for PNG (8-bit gray/GA/RGB/RGBA, all scanline
filters, sequential + Adam7 interlaced), 24-bit BMP, GIF (LZW +
palette, sequential + 4-pass interlaced), JPEG — baseline AND
progressive/SOF2 (own DCT/Huffman codec in operators/jpeg.py — any
sampling factors incl. 4:2:0, restart intervals, spectral selection +
successive approximation; arithmetic raises and falls back), and
PCM WAV (8/16-bit) — stdlib + numpy, no codec library
(``decode_png`` / ``decode_bmp`` / ``decode_gif`` / ``decode_jpeg`` /
``decode_wav`` / ``real_decode``).  On top of those decoders, resize
and frame sampling are REAL too for the same formats: ``real_resize``
does nearest-neighbor resampling and re-encodes as 24-bit BMP
(``encode_bmp``), and ``sample_frames`` extracts time-windowed PCM
frames from WAV payloads, each re-encoded as a standalone playable
WAV (``encode_wav``).  MPEG audio is frame-indexed without a codec
(``parse_mp3_frames`` — spec header tables; byte-exact frame
sampling; perceptual sample decode stays codec-bound), and VIDEO
decodes for real when it is MJPEG-in-AVI (``parse_avi`` +
``sample_avi_frames`` + the JPEG codec — the container walk plus
per-frame image decode).  Only inter-frame video codecs
(H.26x/VP9/AV1) and perceptual MP3 sample decode remain honestly out
of scope; those payloads fall back to the deterministic
byte-stat/byte-chunk stubs, per-format documented.  The
Spark-side plumbing is identical either way: schema contract, Arrow
batch iteration, partition-size control, and the metadata columns a
100 TB media pipeline needs before any decode (size, hash, type tag)
so pruning happens on cheap columns first.

Scale notes: media rows are huge — ``repartition`` by a size-aware
bucket before mapInPandas so one Arrow batch never exceeds executor
memory (spark.sql.execution.arrow.maxRecordsPerBatch bounds rows,
not bytes); decode emits small fixed-width features, so the shuffle
after extraction is cheap.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes int, feat array<float>"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary payload + typed metadata (testdata has
    no real media bytes; production replaces this with the raw column)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("content_md5"),
            F.lit("utf8-text").alias("media_type"),
        ),
    )


def stub_decode(payload: bytes, n_feat: int = 8) -> list[float]:
    """Deterministic fake feature extractor (STUB — no codecs in this
    container).  Real deployments swap in PIL/torchaudio/decord here;
    the signature (bytes → fixed-width float vector) is the contract."""
    if payload is None:
        raise NotImplementedError("real media decode requires codec libraries")
    acc = [0.0] * n_feat
    for i, b in enumerate(payload):
        acc[i % n_feat] += b
    total = sum(acc) or 1.0
    return [round(x / total, 6) for x in acc]


def stub_resize(payload: bytes, width: int = 32, height: int = 32) -> bytes:
    """Deterministic fake resize (STUB — no codecs).  Real deployments
    decode → resample → re-encode; the contract is bytes → bytes with
    target dims carried in metadata."""
    if payload is None:
        raise NotImplementedError("real image resize requires codec libraries")
    n = max(1, width * height // 8)
    rep = (payload * (n // max(1, len(payload)) + 1))[:n]
    return bytes(rep)


def resample_nn(
    w: int, h: int, ch: int, px: bytes, out_w: int, out_h: int
) -> bytes:
    """REAL nearest-neighbor resample over a raw row-major pixel buffer
    (any channel count) — the standard triage resample a media pipeline
    runs before batching into a model (bilinear is a decoder swap)."""
    out = bytearray(out_w * out_h * ch)
    for y in range(out_h):
        sy = y * h // out_h
        for x in range(out_w):
            sx = x * w // out_w
            si = (sy * w + sx) * ch
            di = (y * out_w + x) * ch
            out[di : di + ch] = px[si : si + ch]
    return bytes(out)


def to_rgb(ch: int, px: bytes) -> bytes:
    """Normalize a decoded pixel buffer to 3-channel RGB: gray
    replicates, alpha drops.  Identity for ch == 3."""
    if ch == 3:
        return bytes(px)
    out = bytearray(len(px) // ch * 3)
    for i in range(len(px) // ch):
        v = px[i * ch]
        if ch in (1, 2):  # gray / gray+alpha
            out[i * 3 : i * 3 + 3] = bytes((v, v, v))
        else:  # RGBA → drop alpha
            out[i * 3 : i * 3 + 3] = px[i * ch : i * ch + 3]
    return bytes(out)


def encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """REAL dependency-free 24-bit BMP writer (BITMAPINFOHEADER,
    bottom-up, BGR, 4-byte row padding) — the inverse of decode_bmp,
    so resized outputs stay decodable by this module's own reader."""
    import struct

    row_sz = (w * 3 + 3) & ~3
    img_sz = row_sz * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_sz, 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_sz, 2835, 2835, 0, 0)
    body = bytearray(img_sz)
    for y in range(h):
        src_y = h - 1 - y  # bottom-up
        for x in range(w):
            si = (src_y * w + x) * 3
            di = y * row_sz + x * 3
            body[di : di + 3] = bytes((rgb[si + 2], rgb[si + 1], rgb[si]))  # BGR
    return header + bytes(body)


def real_resize(payload: bytes, width: int = 32, height: int = 32) -> bytes:
    """REAL resize for the formats this module decodes
    (PNG/BMP/GIF/baseline JPEG): decode → nearest-neighbor resample →
    24-bit BMP re-encode.  Progressive JPEG and unrecognized payloads
    fall back to the deterministic stub so a mixed corpus never kills
    the task."""
    import struct
    import zlib

    if payload is None:
        return b""  # null blob -> empty resize, never a task kill
    try:
        fmt, _, _ = probe_image(payload)
        if fmt == "png":
            w, h, ch, px = decode_png(payload)
        elif fmt == "bmp":
            w, h, ch, px = decode_bmp(payload)
        elif fmt == "gif":
            w, h, ch, px = decode_gif(payload)
        elif fmt == "jpeg":
            from clickhub_spark.operators.jpeg import decode_jpeg

            w, h, ch, px = decode_jpeg(payload)
        else:
            return stub_resize(payload, width, height)
        return encode_bmp(width, height, to_rgb(ch, resample_nn(w, h, ch, px, width, height)))
    except (ValueError, IndexError, KeyError, ZeroDivisionError, struct.error, zlib.error):
        return stub_resize(payload, width, height)


def resize_images(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas resize pass: emits (id, resized binary, w, h).

    REAL for PNG/BMP payloads (decode → nearest-neighbor → BMP
    re-encode); deterministic stub otherwise.  Runs before feature
    extraction in a real pipeline so the decode UDF sees fixed-size
    inputs (stable Arrow batch memory)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": [real_resize(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return src.mapInPandas(run, "doc_id long, resized binary, width int, height int")


def encode_wav(sample_rate: int, n_channels: int, bits: int, data: bytes) -> bytes:
    """REAL dependency-free WAV writer (RIFF/WAVE, PCM fmt chunk) — the
    inverse of decode_wav, so sampled frames stay standalone playable
    and decodable by this module's own reader."""
    import struct

    block = max(1, (bits // 8) * max(1, n_channels))
    byte_rate = sample_rate * block
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_wav_frames(
    payload: bytes, every_nth: int, max_frames: int, frame_sz: int
) -> list[tuple[int, bytes]]:
    """REAL frame extraction for PCM WAV: parse the header, slice the
    PCM data chunk into sample-aligned windows of ``frame_sz`` PCM
    bytes, take every ``every_nth`` window up to ``max_frames``, and
    re-encode each as a standalone WAV with the source's rate/channels/
    depth.  Returns [(frame_idx, wav_bytes)]."""
    import struct

    b = bytes(payload)
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    block = (bits // 8) * max(1, n_channels)
    frame_sz -= frame_sz % block or 0  # sample-aligned windows
    frame_sz = max(block, frame_sz)
    out = []
    total = len(data) // frame_sz
    for j, f in enumerate(range(0, total, every_nth)):
        if j >= max_frames:
            break
        pcm = data[f * frame_sz : (f + 1) * frame_sz]
        out.append((f, encode_wav(sample_rate, n_channels, bits, pcm)))
    return out


def sample_frames(
    df: DataFrame,
    every_nth: int = 4,
    max_frames: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_sz: int = 16,
) -> DataFrame:
    """Frame sampling: one row per sampled frame (id, frame_idx, frame
    bytes).  REAL for PCM WAV payloads — the data chunk is sliced into
    sample-aligned ``frame_sz``-byte windows and each sampled window is
    re-encoded as a standalone playable WAV (``encode_wav``), the audio
    analog of video keyframe extraction.  REAL for MPEG audio too:
    ``parse_mp3_frames`` indexes frame headers (no codec needed) and
    each sampled frame is copied byte-exact — a structurally valid
    MPEG frame, extracted the way players seek.  Other payloads keep
    the deterministic stub (raw fixed-size byte windows) so a mixed
    corpus never kills the task; only perceptual VIDEO decode stays
    probe-only (codec-bound).  This is the UDTF-shaped multimodal op:
    one row → many, schema-stable for downstream joins."""
    import struct

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue
                sampled = None
                try:
                    afmt = probe_audio(p)[0]
                    if afmt == "wav":
                        sampled = sample_wav_frames(p, every_nth, max_frames, frame_sz)
                    elif afmt == "mp3":
                        sampled = sample_mp3_frames(p, every_nth, max_frames)
                    elif probe_video(p)[0] == "avi":
                        sampled = sample_avi_frames(p, every_nth, max_frames)
                except (ValueError, IndexError, ZeroDivisionError, struct.error):
                    sampled = None  # corrupt-after-probe → stub fallback
                if sampled is None:
                    total = len(p) // frame_sz
                    sampled = [
                        (f, bytes(p[f * frame_sz : (f + 1) * frame_sz]))
                        for j, f in enumerate(range(0, total, every_nth))
                        if j < max_frames
                    ]
                for f, frame in sampled:
                    ids.append(i)
                    idxs.append(f)
                    frames.append(frame)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    out = src.mapInPandas(run, "doc_id long, frame_idx int, frame binary")
    return out


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], list[float]] = None,
    batch_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Emits (id, media_type, n_bytes, feat) — the downstream join key +
    prune columns + fixed-width features.  Default ``decode_fn`` is
    ``real_decode``: real pixel stats for PNG/BMP payloads, byte-stat
    stub for everything else.
    """
    if decode_fn is None:
        decode_fn = real_decode
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(payload_col).alias("payload"),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    # NULL metadata arrives as NaN over Arrow — keep
                    # the row, zero the size
                    "n_bytes": pdf["n_bytes"].fillna(0).astype("int32"),
                    "feat": [decode_fn(p) for p in pdf["payload"]],
                }
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Unfilter one PNG (sub-)image: ``raw`` is exactly height
    scanlines of 1 filter byte + width*channels pixel bytes; returns
    the unfiltered pixels row-major (None/Sub/Up/Average/Paeth)."""
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (prev[i] if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return out


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL dependency-free PNG decode (zlib + struct only): returns
    (width, height, channels, raw pixel bytes row-major).  Supports
    the 8-bit-depth color types — gray (1ch), gray+alpha (2ch), RGB
    (3ch), RGBA (4ch) — with full scanline unfiltering (None/Sub/Up/
    Average/Paeth), both sequential and Adam7-interlaced (each of the
    7 passes is an independently filtered sub-image; unfilter per
    pass, then scatter pixels onto the output grid).  Palette
    (type 3) and 16-bit payloads raise ValueError so callers fall
    back to the metadata-only path instead of silently mis-decoding."""
    import struct
    import zlib

    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        out = _png_unfilter(raw, width, height, channels)
        return (width, height, channels, bytes(out))
    # Adam7: 7 consecutive sub-images in the stream (empty passes
    # contribute no bytes, not even filter bytes)
    out = bytearray(width * height * channels)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        sub_len = (pw * channels + 1) * ph
        sub = _png_unfilter(raw[off : off + sub_len], pw, ph, channels)
        off += sub_len
        for py in range(ph):
            y = y0 + py * dy
            for px in range(pw):
                x = x0 + px * dx
                s = (py * pw + px) * channels
                d = (y * width + x) * channels
                out[d : d + channels] = sub[s : s + channels]
    if off != len(raw):
        raise ValueError("PNG Adam7 pixel data length mismatch")
    return (width, height, channels, bytes(out))


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL dependency-free BMP decode: uncompressed (BI_RGB) 24-bit
    BITMAPINFOHEADER payloads → (width, height, 3, RGB bytes row-major
    top-down).  BMP stores rows bottom-up padded to 4 bytes in BGR
    order; both are normalized here."""
    import struct

    b = bytes(payload)
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", b[10:14])
    width, height = struct.unpack("<ii", b[18:26])
    bpp, compression = struct.unpack("<HI", b[28:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    row_sz = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = b[data_off + src_y * row_sz : data_off + src_y * row_sz + width * 3]
        for x in range(width):
            out[(y * width + x) * 3 + 0] = row[x * 3 + 2]  # R ← BGR
            out[(y * width + x) * 3 + 1] = row[x * 3 + 1]
            out[(y * width + x) * 3 + 2] = row[x * 3 + 0]
    return (width, height, 3, bytes(out))


def decode_wav(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL dependency-free WAV decode (struct only): RIFF/WAVE PCM
    8-bit or 16-bit → (sample_rate, n_channels, samples in [-1, 1]
    interleaved).  Float/ADPCM/extensible formats raise ValueError so
    callers fall back to metadata-only triage."""
    import struct

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if bits == 8:  # unsigned
        samples = [(v - 128) / 128.0 for v in data]
    else:  # 16-bit signed little-endian
        n = len(data) // 2
        samples = [v / 32768.0 for v in struct.unpack(f"<{n}h", data[: n * 2])]
    return (sample_rate, n_channels, samples)


#: MPEG audio bitrate tables, kbps (ISO/IEC 11172-3 / 13818-3; public
#: spec constants).  Keyed by (is_mpeg1, layer); index 0 = "free"
#: (unsupported here), 15 = invalid.
_MP3_BITRATES = {
    (True, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (True, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (True, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (False, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (False, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (False, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
#: sample-rate tables by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mp3_frame_at(b: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``; returns
    (size, sample_rate, n_channels, samples_per_frame, bitrate_kbps)
    or None if the 4 bytes are not a valid header."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:  # 11-bit frame sync
        return None
    ver_bits = (h >> 19) & 3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 3  # 1=III, 2=II, 3=I
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    padding = (h >> 9) & 1
    channel_mode = (h >> 6) & 3
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits  # 1, 2, 3
    is_mpeg1 = ver_bits == 3
    bitrate = _MP3_BITRATES[(is_mpeg1, layer)][br_idx] * 1000
    rate = _MP3_RATES[ver_bits][sr_idx]
    if layer == 1:
        size = (12 * bitrate // rate + padding) * 4
        samples = 384
    elif layer == 2:
        size = 144 * bitrate // rate + padding
        samples = 1152
    else:  # Layer III
        if is_mpeg1:
            size = 144 * bitrate // rate + padding
            samples = 1152
        else:
            size = 72 * bitrate // rate + padding
            samples = 576
    n_channels = 1 if channel_mode == 3 else 2
    return (size, rate, n_channels, samples, bitrate // 1000)


def parse_mp3_frames(payload: bytes) -> list[tuple[int, int, int, int, int, int]]:
    """Frame INDEX of an MPEG audio stream without decoding — pure
    header arithmetic from the public spec tables, the audio analog of
    the container probes.  Skips a leading ID3v2 tag (synchsafe size),
    then walks frame headers; returns
    [(offset, size, sample_rate, n_channels, samples, bitrate_kbps)].
    Stops at the first invalid header (trailing garbage / ID3v1 tags
    end the walk cleanly).  Perceptual DECODE still needs a codec
    library and stays out of scope; indexing, duration math, and
    byte-exact frame extraction do not."""
    if payload is None:
        return []
    b = bytes(payload)
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        pos = 10 + (
            ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        )
        if b[5] & 0x10:
            # ID3v2.4 footer flag: tag size excludes the 10-byte
            # footer, so the first frame sync sits 10 bytes further
            # (ADVICE r5 — without this the walk degrades to the
            # byte-stat stub)
            pos += 10
    out = []
    while pos + 4 <= len(b):
        f = _mp3_frame_at(b, pos)
        if f is None or pos + f[0] > len(b):
            break
        size, rate, ch, samples, kbps = f
        out.append((pos, size, rate, ch, samples, kbps))
        pos += size
    return out


def sample_mp3_frames(
    payload: bytes, every_nth: int, max_frames: int
) -> list[tuple[int, bytes]]:
    """Byte-exact MP3 frame sampling: every ``every_nth`` frame,
    copied verbatim (header + payload) from the stream.  Each sampled
    slice is a structurally valid MPEG audio frame; Layer III's bit
    reservoir means the first frames of a slice can borrow main_data
    from unsampled predecessors (decoders handle this by design —
    it is how players seek), so extraction needs no re-encode."""
    frames = parse_mp3_frames(payload)
    if len(frames) < 2:
        raise ValueError("not an MPEG audio stream")
    b = bytes(payload)
    out = []
    for j, fi in enumerate(range(0, len(frames), every_nth)):
        if j >= max_frames:
            break
        off, size = frames[fi][0], frames[fi][1]
        out.append((fi, b[off : off + size]))
    return out


def probe_audio(payload: bytes) -> tuple[str | None, int, int, int]:
    """Header-only audio triage: (format, sample_rate, n_channels,
    n_samples) without decoding samples — the cheap prune columns."""
    import struct

    if payload is None or len(payload) < 44:
        return (None, -1, -1, -1)
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        if b[:4] == b"RIFF":
            # a non-WAVE RIFF (e.g. AVI) is never MPEG audio; don't
            # let JPEG frame bytes inside it chain into pseudo-syncs
            return (None, -1, -1, -1)
        frames = parse_mp3_frames(b)
        if len(frames) >= 2:
            # consistent stream: rate/channels from the first frame,
            # total samples summed over the parsed frame index.
            _, _, rate, ch, _, _ = frames[0]
            return ("mp3", rate, ch, sum(f[4] for f in frames))
        return (None, -1, -1, -1)
    pos, rate, ch, bits, data_sz = 12, -1, -1, 8, 0
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            _, ch, rate, _, _, bits = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
        elif cid == b"data":
            data_sz = size
        pos += 8 + size + (size & 1)
    n = data_sz // max(1, (bits // 8) * max(1, ch))
    return ("wav", rate, ch, n)


def real_decode(payload: bytes, n_feat: int = 8) -> list[float]:
    """Media-statistic feature extractor backed by the REAL
    PNG/BMP/GIF/JPEG/WAV decoders for the formats the header probes
    detect; other payloads
    (including the utf8-text fakes the testdata derives) keep the
    deterministic byte-stat stub so the mapInPandas contract never
    raises on mixed corpora.  Image features (fixed n_feat wide):
    [width, height, channels, mean/255, std/255, min/255, max/255,
    mean |horizontal gradient|/255]; audio features: [sample_rate,
    n_channels, n_samples, rms, peak, zero-crossing rate, mean,
    duration_sec] — the cheap stats a quality-filter or near-dup
    prefilter runs before any model inference."""
    if payload is None:
        return [0.0] * n_feat  # null blob -> null features, never a task kill
    import math
    import struct
    import zlib

    try:
        fmt, _, _ = probe_image(payload)
        if fmt == "png":
            w, h, ch, px = decode_png(payload)
        elif fmt == "bmp":
            w, h, ch, px = decode_bmp(payload)
        elif fmt == "gif":
            w, h, ch, px = decode_gif(payload)
        elif fmt == "jpeg":
            from clickhub_spark.operators.jpeg import decode_jpeg

            w, h, ch, px = decode_jpeg(payload)
        elif (afmt := probe_audio(payload)[0]) == "wav":
            rate, ach, s = decode_wav(payload)
            if not s:
                return stub_decode(payload, n_feat)
            rms = math.sqrt(sum(v * v for v in s) / len(s))
            zc = sum(1 for i in range(1, len(s)) if (s[i - 1] < 0) != (s[i] < 0))
            feats = [
                float(rate),
                float(ach),
                float(len(s)),
                round(rms, 6),
                round(max(abs(v) for v in s), 6),
                round(zc / max(1, len(s) - 1), 6),
                round(sum(s) / len(s), 6),
                round(len(s) / ach / rate, 6),
            ]
            return (feats + [0.0] * n_feat)[:n_feat]
        elif probe_video(payload)[0] == "avi":
            info = parse_avi(payload)
            dur = (
                round(info["n_frames"] / info["fps"], 6) if info["fps"] > 0 else 0.0
            )
            feats = [
                float(info["w"]),
                float(info["h"]),
                float(info["n_frames"]),
                float(info["fps"]),
                dur,
                0.0,
                0.0,
                0.0,
            ]
            if info["codec"] == "MJPG" and info["frames"]:
                # MJPEG: first frame is a plain JPEG — decode it for
                # REAL pixel stats alongside the container facts
                from clickhub_spark.operators.jpeg import decode_jpeg

                off, size = info["frames"][0]
                _, _, fch, fpx = decode_jpeg(bytes(payload)[off : off + size])
                fmean = sum(fpx) / len(fpx)
                fvar = sum((v - fmean) ** 2 for v in fpx) / len(fpx)
                feats[5] = round(fmean / 255.0, 6)
                feats[6] = round(math.sqrt(fvar) / 255.0, 6)
                feats[7] = float(fch)
            return (feats + [0.0] * n_feat)[:n_feat]
        elif afmt == "mp3":
            # header-derived (not decoded) but REAL stream facts:
            # rate/channels/duration/bitrate from the frame index.
            frames = parse_mp3_frames(payload)
            rate, ach = frames[0][2], frames[0][3]
            total = sum(f[4] for f in frames)
            feats = [
                float(rate),
                float(ach),
                float(total),
                float(len(frames)),
                round(sum(f[5] for f in frames) / len(frames), 6),
                round(total / rate, 6),
                0.0,
                0.0,
            ]
            return (feats + [0.0] * n_feat)[:n_feat]
        else:
            return stub_decode(payload, n_feat)
    except (ValueError, IndexError, KeyError, ZeroDivisionError, struct.error, zlib.error):
        # A payload can pass the magic-byte probe yet still be corrupt:
        # zlib.error from a truncated PNG IDAT, struct.error from a
        # short WAV 'fmt ' chunk, IndexError from a bogus BMP data
        # offset.  One bad blob must never kill the mapInPandas task
        # (the 'never raises on mixed corpora' contract) — fall back to
        # the deterministic byte-stat stub.  probe_audio is inside the
        # try for the same reason: it header-parses arbitrary bytes.
        return stub_decode(payload, n_feat)
    n = len(px)
    if n == 0:  # 0x0 image: header-valid, no pixels to summarize
        return ([float(w), float(h), float(ch)] + [0.0] * n_feat)[:n_feat]
    mean = sum(px) / n
    var = sum((v - mean) ** 2 for v in px) / n
    grad = [
        abs(px[i] - px[i - ch])
        for y in range(h)
        for i in range(y * w * ch + ch, (y + 1) * w * ch)
    ]
    mean_grad = sum(grad) / len(grad) if grad else 0.0
    feats = [
        float(w),
        float(h),
        float(ch),
        round(mean / 255.0, 6),
        round(math.sqrt(var) / 255.0, 6),
        round(min(px) / 255.0, 6),
        round(max(px) / 255.0, 6),
        round(mean_grad / 255.0, 6),
    ]
    return (feats + [0.0] * n_feat)[:n_feat]


def probe_image(payload: bytes) -> tuple[str | None, int, int]:
    """REAL (non-stub) media op: parse (format, width, height) straight
    from header bytes — PNG IHDR, GIF logical screen descriptor, BMP
    info header, JPEG SOFn marker scan.  No codec library needed,
    which is exactly why a 100 TB pipeline runs this triage pass
    (resolution/format pruning) BEFORE any real decode.  Returns
    (None, -1, -1) for unrecognized payloads."""
    import struct

    if payload is None or len(payload) < 10:
        return (None, -1, -1)
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h))
    if b[:2] == b"\xff\xd8":  # JPEG: scan for a SOFn frame header
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seg_len
        return ("jpeg", -1, -1)  # valid SOI but no frame header found
    return (None, -1, -1)


def probe_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas triage pass over binary payloads: (id, img_format,
    width, height, n_bytes).  Cheap header parsing only — the pruning
    columns a media pipeline filters on before paying for decode."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = [probe_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "img_format": [p[0] for p in probed],
                    "width": [p[1] for p in probed],
                    "height": [p[2] for p in probed],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return src.mapInPandas(
        run, "doc_id long, img_format string, width int, height int, n_bytes int"
    )


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/END codes,
    12-bit max code width) → color-table indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits:
        byte_i, bit_o = divmod(bitpos, 8)
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> bit_o) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: [i] for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("bad first LZW code")
        elif code in table:
            entry = table[code]
            table[next_code] = prev + [entry[0]]
            next_code += 1
        elif code == next_code:  # the KwKwK case
            entry = prev + [prev[0]]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return out


def decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL dependency-free GIF decode (stdlib only — GIF's LZW needs
    no codec library, unlike JPEG's DCT): first frame of a GIF87a/89a
    → (width, height, 3, RGB bytes row-major top-down) via header
    parse → color table → LZW decompress → palette lookup.  Both
    sequential and 4-pass interlaced row orders are handled (the
    interlaced stream is de-interlaced by row remapping)."""
    import struct

    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = b[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = b[pos : pos + 3 * n]
                pos += 3 * n
            interlaced = bool(ipacked & 0x40)
            if ct is None:
                raise ValueError("GIF image without color table")
            min_code_size = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                sz = b[pos]
                data += b[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            idx = _lzw_decode(min_code_size, bytes(data))
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            if interlaced:
                # GIF 4-pass interlace: the stream carries rows
                # 0,8,16,… then 4,12,… then 2,6,10,… then 1,3,5,…;
                # map each decoded row back to its display position
                # (pure index arithmetic over the LZW output).
                deint = [0] * (w * h)
                src_row = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    for y in range(start, h, step):
                        deint[y * w : (y + 1) * w] = idx[
                            src_row * w : (src_row + 1) * w
                        ]
                        src_row += 1
                idx = deint
            out = bytearray(w * h * 3)
            n_colors = len(ct) // 3
            for i in range(w * h):
                c = idx[i]
                if c >= n_colors:
                    raise ValueError("GIF index outside color table")
                out[i * 3 : i * 3 + 3] = ct[c * 3 : c * 3 + 3]
            return (w, h, 3, bytes(out))
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


# --- AVI / MJPEG video (RIFF container; each frame is a JPEG) -------------
#
# The last modality gap: "video" in a data pipeline is a container
# walk + per-frame image decode, and both halves are already here —
# RIFF chunk parsing (decode_wav above) and a real baseline JPEG
# codec (operators/jpeg.py).  MJPEG-in-AVI therefore decodes FOR REAL
# with no codec library: parse the container, slice byte-exact JPEG
# frames, decode them with decode_jpeg.  Inter-frame codecs
# (H.26x/VP9/AV1) stay honestly out of scope — entropy-coded
# motion-compensation needs a real codec; their AVI/ISO containers
# still probe (codec fourcc, dimensions, frame count).


def encode_avi_mjpeg(
    w: int, h: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Minimal standards-shaped AVI writer (RIFF 'AVI ': hdrl with
    avih + one 'vids'/MJPG stream, movi of '00dc' JPEG chunks, idx1)
    — used for fixtures and for re-emitting sampled clips."""
    import struct

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(four: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", four + data)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        0,
        0,
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,
        1,  # one stream
        0,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, max(1, fps), 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_chunks)
    # idx1 offsets are relative to the 'movi' fourcc
    idx, off = [], 4
    for f in frames:
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> dict:
    """Container walk → {w, h, fps, n_frames, codec, frames:[(off,
    size)]} with ``frames`` pointing at byte-exact video chunks
    ('##dc'/'##db').  Raises ValueError if not a RIFF AVI."""
    import struct

    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    info = {"w": -1, "h": -1, "fps": -1.0, "codec": "", "frames": []}

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            data_start = pos + 8
            data_end = min(data_start + size, end)
            if cid == b"LIST":
                walk(data_start + 4, data_end)
            elif cid == b"avih" and size >= 40:
                f = struct.unpack("<10I", b[data_start : data_start + 40])
                if f[0]:
                    info["fps"] = round(1_000_000 / f[0], 3)
                info["w"], info["h"] = f[8], f[9]
            elif cid == b"strh" and size >= 8:
                if b[data_start : data_start + 4] == b"vids":
                    info["codec"] = (
                        b[data_start + 4 : data_start + 8].decode("ascii", "replace")
                    )
            elif cid[2:4] in (b"dc", b"db"):
                info["frames"].append((data_start, size))
            pos = data_start + size + (size % 2)

    walk(12, len(b))
    info["n_frames"] = len(info["frames"])
    return info


def probe_video(payload: bytes) -> tuple[str | None, int, int, int, float]:
    """Header-only video triage: (format, w, h, n_frames, fps); Nones
    for non-AVI payloads."""
    try:
        info = parse_avi(payload)
    except (ValueError, IndexError):
        return (None, -1, -1, -1, -1.0)
    return ("avi", info["w"], info["h"], info["n_frames"], info["fps"])


def sample_avi_frames(
    payload: bytes, every_nth: int, max_frames: int
) -> list[tuple[int, bytes]]:
    """Byte-exact frame sampling from an AVI: every ``every_nth``
    video chunk, copied verbatim.  For MJPEG each sampled chunk is a
    standalone JPEG (decodable by operators/jpeg.decode_jpeg); for
    inter-frame codecs the chunks are still exact but only keyframes
    are independently decodable — same contract as MP3's bit
    reservoir note."""
    info = parse_avi(payload)
    if not info["frames"]:
        raise ValueError("AVI contains no video chunks")
    b = bytes(payload)
    out = []
    for j, fi in enumerate(range(0, len(info["frames"]), every_nth)):
        if j >= max_frames:
            break
        off, size = info["frames"][fi]
        out.append((fi, b[off : off + size]))
    return out
