"""Baseline JPEG codec — pure stdlib + numpy, no codec libraries.

Closes the last probe-only image format in operators/multimodal.py
(PNG/BMP/GIF already decode for real; reference parity: the reference
treats media as opaque blobs, SURVEY §2 multimodal row).  Scope:

- ``encode_jpeg``: baseline sequential DCT, JFIF, 4:4:4 (no chroma
  subsampling), the spec's Annex K quantization + Huffman tables with
  the libjpeg quality scaling.  Grayscale (1 channel) and RGB (3).
- ``encode_jpeg_progressive``: SOF2 with the standard spectral-
  selection + successive-approximation scan script (round 6; 4:4:4 /
  grayscale) — transmits the SAME quantized coefficients as baseline,
  so decode(progressive) ≡ decode(baseline) pins the whole pipeline.
- ``decode_jpeg``: baseline sequential (SOF0/1) AND progressive
  (SOF2: spectral selection, successive approximation, EOB runs,
  correction-bit refinement), ANY sampling factors up to 4×4 (so
  4:2:0 / 4:2:2 from other encoders decode too), restart intervals
  (DRI/RSTn), 8-bit precision.  Arithmetic coding / lossless /
  12-bit raise ValueError — the multimodal dispatch catches that and
  falls back to the deterministic stub, keeping the "one bad blob
  never kills the task" contract.

Everything is per-payload CPU work inside mapInPandas batches — the
Spark-side plumbing (schema, partitioning, Arrow batching) is shared
with the other codecs; numpy does the 8×8 DCTs as small matmuls.
"""

from __future__ import annotations

import struct

import numpy as np

# -- spec tables (ITU T.81 Annex K) -----------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: dct(block) = C @ B @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Decoder form: (length, code) -> value."""
    return {(l, c): v for v, (c, l) in _huff_codes(bits, vals).items()}


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((table * scale + 50) / 100), 1, 255)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def write_signed(self, v: int) -> None:
        s = _category(v)
        if s:
            self.write(v if v > 0 else v + (1 << s) - 1, s)

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits to a byte


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def aligned_restart(self) -> None:
        """Consume padding + the RSTn marker at a restart boundary."""
        self.n = 0
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


class _RestartMarker(ValueError):
    """Raised when a RSTn appears mid-entropy-read — a malformed
    stream unless the decoder expected a restart boundary.  Subclasses
    ValueError so the multimodal dispatch's fallback catch covers it
    (the 'one bad blob never kills the task' contract)."""

    def __init__(self, marker: int) -> None:
        super().__init__(f"unexpected restart marker 0x{marker:02X}")
        self.marker = marker


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# -- encoder ----------------------------------------------------------------


def _to_planes(w: int, h: int, ch: int, px: bytes) -> list[np.ndarray]:
    """Validate interleaved 8-bit input and convert to Y (gray) or
    Y/Cb/Cr planes — the one copy of the color matrix both encoders
    share, so a coefficient fix cannot reach one and miss the other
    (the decode(progressive) ≡ decode(baseline) invariant depends on
    the two pipelines quantizing identical planes)."""
    if ch not in (1, 3) or len(px) != w * h * ch:
        raise ValueError("encoder expects gray or RGB interleaved 8-bit pixels")
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(np.float64)
    if ch == 1:
        return [img[..., 0]]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128,
    ]


def _encode_block(
    writer: _BitWriter,
    plane: np.ndarray,
    y0: int,
    x0: int,
    qtab: np.ndarray,
    dc: dict,
    ac: dict,
    pred: list[int],
    ci: int,
) -> None:
    ph, pw = plane.shape
    ys = np.clip(np.arange(y0, y0 + 8), 0, ph - 1)
    xs = np.clip(np.arange(x0, x0 + 8), 0, pw - 1)
    block = plane[np.ix_(ys, xs)] - 128.0
    coef = _C @ block @ _C.T
    q = np.round(coef.flatten() / qtab).astype(np.int64)
    zz = [int(q[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    s = _category(diff)
    code, length = dc[s]
    writer.write(code, length)
    writer.write_signed(diff)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            if run == 16:
                c, ln = ac[0xF0]  # ZRL
                writer.write(c, ln)
                run = 0
            continue
        s = _category(zz[i])
        c, ln = ac[(run << 4) | s]
        writer.write(c, ln)
        writer.write_signed(zz[i])
        run = 0
    if last_nz < 63:
        c, ln = ac[0x00]  # EOB
        writer.write(c, ln)


def encode_jpeg(
    w: int, h: int, ch: int, px: bytes, quality: int = 85, subsample: bool = False
) -> bytes:
    """Baseline JFIF encode of interleaved 8-bit pixels (ch=1 gray or
    ch=3 RGB), Annex K tables scaled by ``quality``.  ``subsample=True``
    emits 4:2:0 (2×2 luma blocks per MCU, chroma box-averaged to half
    resolution — the dominant layout in web corpora, ~50% smaller);
    default is 4:4:4."""
    planes = _to_planes(w, h, ch, px)
    sub = subsample and ch == 3
    if sub:
        # box-average chroma to half resolution (pad to even first)
        for i in (1, 2):
            p = planes[i]
            pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            planes[i] = (
                pe[0::2, 0::2] + pe[1::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 1::2]
            ) / 4.0

    qt = [_scale_q(Q_LUM, quality), _scale_q(Q_CHROM, quality)]
    dc_codes = [_huff_codes(DC_LUM_BITS, DC_LUM_VALS), _huff_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_codes = [_huff_codes(AC_LUM_BITS, AC_LUM_VALS), _huff_codes(AC_CHROM_BITS, AC_CHROM_VALS)]

    writer = _BitWriter()
    pred = [0] * len(planes)
    if sub:
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):
                    for bx in range(2):
                        _encode_block(
                            writer, planes[0], my * 16 + by * 8, mx * 16 + bx * 8,
                            qt[0], dc_codes[0], ac_codes[0], pred, 0,
                        )
                for ci in (1, 2):
                    _encode_block(
                        writer, planes[ci], my * 8, mx * 8,
                        qt[1], dc_codes[1], ac_codes[1], pred, ci,
                    )
    else:
        bw, bh = (w + 7) // 8, (h + 7) // 8
        for by in range(bh):
            for bx in range(bw):
                for ci, plane in enumerate(planes):
                    ti = 0 if ci == 0 else 1
                    _encode_block(
                        writer, plane, by * 8, bx * 8,
                        qt[ti], dc_codes[ti], ac_codes[ti], pred, ci,
                    )
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti in range(2 if ch == 3 else 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti])
        out += bytes(int(qt[ti][ZIGZAG[i]]) for i in range(64))
    ncomp = 3 if ch == 3 else 1
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (0x22 if ci == 0 and sub else 0x11)
        out += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    tables = [
        (0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS),
        (0x01, DC_CHROM_BITS, DC_CHROM_VALS), (0x11, AC_CHROM_BITS, AC_CHROM_VALS),
    ][: 2 if ch == 1 else 4]
    for tc, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- progressive encoder -----------------------------------------------------


class _SymbolRecorder:
    """Stand-in for a Huffman code dict on the dry pass: records which
    symbols a scan emits (to build its table) and returns a dummy
    (code, length) so the scan encoder runs unchanged."""

    def __init__(self) -> None:
        self.seen: set[int] = set()

    def __getitem__(self, sym: int) -> tuple[int, int]:
        self.seen.add(sym)
        return (0, 1)


def _uniform_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Canonical Huffman (bits, vals) giving every used symbol the same
    code length L = ceil(log2(n)) (+1 when n is an exact power of two,
    so the all-ones code of the maximum length stays unused per T.81's
    table-building convention).  Suboptimal size, trivially valid."""
    vals = sorted(symbols) or [0]
    n = len(vals)
    # a DHT "bits" entry is one byte: at most 255 codes of one length.
    # n can theoretically reach 256 (all AC run/size symbols in one
    # scan) — split the last symbol onto the next code length rather
    # than letting bytes([256]) raise at serialization time
    # (ADVICE r6: unguarded invariant).
    length = max(1, (n - 1).bit_length())
    if n == (1 << length):
        length += 1
    bits = [0] * 16
    if n > 255:
        if length >= 16:
            raise ValueError(f"huffman table overflow: {n} symbols")
        bits[length - 1] = n - 1
        bits[length] = 1
    else:
        bits[length - 1] = n
    return bits, vals


def _prog_dc_scan(writer, codes, comp_coefs, al, first):
    """Interleaved DC scan over all components (4:4:4 grids align, so
    the MCU is one block per component)."""
    bh, bw, _ = comp_coefs[0].shape
    pred = [0] * len(comp_coefs)
    for by in range(bh):
        for bx in range(bw):
            for ci, cc in enumerate(comp_coefs):
                dc = int(cc[by, bx, 0])
                if first:
                    v = dc >> al  # arithmetic shift per G.1.2.1
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = _category(diff)
                    c, ln = codes[ci][s]
                    writer.write(c, ln)
                    writer.write_signed(diff)
                else:
                    writer.write((dc >> al) & 1, 1)


def _prog_ac_first(writer, ac, cc, ss, se, al):
    """AC first pass for one component: runs + cross-block EOB runs."""
    bh, bw, _ = cc.shape
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            n = min(eobrun, 0x7FFF)
            cat = n.bit_length() - 1
            c, ln = ac[cat << 4]
            writer.write(c, ln)
            if cat:
                writer.write(n - (1 << cat), cat)
            eobrun -= n

    for by in range(bh):
        for bx in range(bw):
            band = [
                (int(cc[by, bx, k]) // (1 << al))
                if int(cc[by, bx, k]) >= 0
                else -((-int(cc[by, bx, k])) >> al)
                for k in range(ss, se + 1)
            ]
            last_nz = max((i for i, v in enumerate(band) if v), default=-1)
            if last_nz < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for v in band[: last_nz + 1]:
                if v == 0:
                    run += 1
                    if run == 16:
                        c, ln = ac[0xF0]
                        writer.write(c, ln)
                        run = 0
                    continue
                s = _category(v)
                c, ln = ac[(run << 4) | s]
                writer.write(c, ln)
                writer.write_signed(v)
                run = 0
            if last_nz < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def _prog_ac_refine(writer, ac, cc, ss, se, al):
    """AC refinement for one component (the G.1.2.3 / libjpeg
    encode_mcu_AC_refine shape, per-block EOB): newly-nonzero
    coefficients emit (run<<4)|1 + a sign bit; correction bits of
    nonzero-history coefficients are emitted exactly where the decoder
    consumes them — while crossing runs, and in the post-EOB sweep."""
    bh, bw, _ = cc.shape
    for by in range(bh):
        for bx in range(bw):
            raw = [int(cc[by, bx, k]) for k in range(ss, se + 1)]
            mag = [(-v >> al) if v < 0 else (v >> al) for v in raw]
            # last NEW nonzero (mag == 1): beyond it only history bits
            last_new = max((i for i, m in enumerate(mag) if m == 1), default=-1)
            run = 0
            pending: list[int] = []  # correction bits crossed in the run
            for i in range(last_new + 1):
                if mag[i] == 0:
                    run += 1
                    if run == 16:
                        # only meaningful before the last new nonzero
                        c, ln = ac[0xF0]
                        writer.write(c, ln)
                        for b in pending:
                            writer.write(b, 1)
                        pending = []
                        run = 0
                    continue
                if mag[i] > 1:  # history: correction bit, run unchanged
                    pending.append(mag[i] & 1)
                    continue
                c, ln = ac[(run << 4) | 1]
                writer.write(c, ln)
                writer.write(1 if raw[i] > 0 else 0, 1)
                for b in pending:
                    writer.write(b, 1)
                pending = []
                run = 0
            # per-block EOB (run-length 1) + post-EOB correction sweep
            if last_new < len(mag) - 1 or pending:
                c, ln = ac[0x00]
                writer.write(c, ln)
                for b in pending:
                    writer.write(b, 1)
                for i in range(last_new + 1, len(mag)):
                    if mag[i] > 1:
                        writer.write(mag[i] & 1, 1)


def encode_jpeg_progressive(
    w: int, h: int, ch: int, px: bytes, quality: int = 85
) -> bytes:
    """Progressive (SOF2) JFIF encode, 4:4:4 / grayscale, with the
    standard spectral-selection + successive-approximation script
    (DC first at Al=1 → per-component AC 1-5 and 6-63 at Al=2 → AC
    refinements Al=2→1→0 → DC refinement): every decoder scan kind is
    exercised, including EOB runs and correction-bit sweeps.  The
    quantized coefficients are identical to ``encode_jpeg``'s at the
    same quality — progressive only reorders their transmission — so
    decode(progressive) ≡ decode(baseline) byte-for-byte, which is how
    tests pin the whole pipeline.  Per-scan Huffman tables are
    uniform-length canonical codes over the symbols the scan actually
    uses (valid, marginally larger than optimal)."""
    planes = _to_planes(w, h, ch, px)
    qt = [_scale_q(Q_LUM, quality), _scale_q(Q_CHROM, quality)]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    comp_coefs = []
    for ci, plane in enumerate(planes):
        q = qt[0 if ci == 0 else 1]
        cc = np.zeros((bh, bw, 64), dtype=np.int32)
        ph, pw = plane.shape
        for by in range(bh):
            for bx in range(bw):
                ys = np.clip(np.arange(by * 8, by * 8 + 8), 0, ph - 1)
                xs = np.clip(np.arange(bx * 8, bx * 8 + 8), 0, pw - 1)
                block = plane[np.ix_(ys, xs)] - 128.0
                qq = np.round((_C @ block @ _C.T).flatten() / q).astype(np.int64)
                cc[by, bx] = [int(qq[ZIGZAG[i]]) for i in range(64)]
        comp_coefs.append(cc)

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti in range(2 if ch == 3 else 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti])
        out += bytes(int(qt[ti][ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])

    def run_scan(scan_fn, table_class: int) -> tuple[bytes, bytes]:
        """Dry pass to collect symbols → table → real pass; returns
        (DHT segments, entropy bytes).  table_class: 0 DC, 1 AC."""
        rec = _SymbolRecorder()
        scan_fn(_BitWriter(), rec)
        bits, vals = _uniform_table(rec.seen)
        codes = _huff_codes(bits, vals)
        wtr = _BitWriter()
        scan_fn(wtr, codes)
        wtr.flush()
        dht = (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(vals))
            + bytes([(table_class << 4) | 0])
            + bytes(bits)
            + bytes(vals)
        )
        return dht, bytes(wtr.buf)

    def sos(comp_ids: list[int], td_ta: int, ss: int, se: int, ah: int, al: int) -> bytes:
        seg = bytearray(
            b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        )
        for cid in comp_ids:
            seg += bytes([cid, td_ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    # scan 1: DC first, all components interleaved, Al=1 (one shared
    # DC table id 0 — the dry pass pools every component's symbols)
    dht, ent = run_scan(
        lambda wr, cd: _prog_dc_scan(wr, [cd] * ncomp, comp_coefs, 1, True), 0
    )
    out += dht + sos(list(range(1, ncomp + 1)), 0x00, 0, 0, 0, 1) + ent
    # per-component AC scans
    for ci in range(ncomp):
        cc = comp_coefs[ci]
        for ss_, se_, ah_, al_ in [(1, 5, 0, 2), (6, 63, 0, 2)]:
            dht, ent = run_scan(
                lambda wr, cd, cc=cc, a=(ss_, se_, al_): _prog_ac_first(
                    wr, cd, cc, a[0], a[1], a[2]
                ),
                1,
            )
            out += dht + sos([ci + 1], 0x00, ss_, se_, ah_, al_) + ent
    for ah_, al_ in [(2, 1), (1, 0)]:
        for ci in range(ncomp):
            cc = comp_coefs[ci]
            dht, ent = run_scan(
                lambda wr, cd, cc=cc, a=al_: _prog_ac_refine(wr, cd, cc, 1, 63, a),
                1,
            )
            out += dht + sos([ci + 1], 0x00, 1, 63, ah_, al_) + ent
    # final scan: DC refinement (no Huffman table needed)
    wtr = _BitWriter()
    _prog_dc_scan(wtr, None, comp_coefs, 0, False)
    wtr.flush()
    out += sos(list(range(1, ncomp + 1)), 0x00, 0, 0, 1, 0) + bytes(wtr.buf)
    out += b"\xff\xd9"
    return bytes(out)


# -- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """JPEG decode → (w, h, channels, interleaved 8-bit pixels).
    Handles baseline sequential (SOF0/1) and PROGRESSIVE (SOF2):
    spectral selection, successive approximation (DC+AC first and
    refinement passes, EOB runs), any sampling factors up to 4×4,
    restart intervals.  Raises ValueError on arithmetic-coded /
    lossless / hierarchical / 12-bit streams (the multimodal dispatch
    treats that as 'fall back to stub', same contract as every other
    codec here)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] | None = None
    eobrun = [0]
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seglen < 2:  # would stall the marker walk on crafted bytes
            raise ValueError("malformed segment length")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.empty(64)
                for i in range(64):
                    tbl[ZIGZAG[i]] = seg[o + i]
                qt[tq] = tbl
                o += 64
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                huff[(tc, th)] = _huff_lookup(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad sampling factors {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (arithmetic/lossless) unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                matches = [
                    (ci, c) for ci, c in enumerate(comps) if c["id"] == cs
                ]
                if not matches:
                    raise ValueError(f"SOS names unknown component id {cs}")
                ci, c = matches[0]
                scan_comps.append({**c, "ci": ci, "td": tt >> 4, "ta": tt & 0xF})
            pos += seglen
            if not progressive:
                if len(scan_comps) < len(comps):
                    # T.81-legal multi-scan (non-interleaved) baseline:
                    # decoding only the first scan would silently
                    # return one component with the wrong geometry —
                    # raise so the dispatch routes to the stub instead
                    raise ValueError(
                        "multi-scan baseline JPEG unsupported "
                        "(single interleaved scan only)"
                    )
                return _decode_scan(
                    payload, pos, w, h, scan_comps, qt, huff, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if coefs is None:
                coefs = _alloc_coefs(comps, w, h)
            pos = _decode_prog_scan(
                payload, pos, w, h, comps, scan_comps, coefs, huff,
                ss, se, ah, al, restart_interval, eobrun,
            )
            continue
        pos += seglen
    if progressive and coefs is not None:
        return _assemble_progressive(coefs, comps, qt, w, h)
    raise ValueError("no scan data found")


def _mcu_grid(comps: list[dict], w: int, h: int) -> tuple[int, int, int, int]:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    return (
        (w + 8 * hmax - 1) // (8 * hmax),
        (h + 8 * vmax - 1) // (8 * vmax),
        hmax,
        vmax,
    )


def _alloc_coefs(comps: list[dict], w: int, h: int) -> list[np.ndarray]:
    """Per-component coefficient store in ZIGZAG index order, on the
    MCU-padded block grid (the superset of both traversal orders)."""
    mcux, mcuy, _, _ = _mcu_grid(comps, w, h)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32) for c in comps
    ]


def _nonint_dims(c: dict, w: int, h: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Block grid of a NON-interleaved scan: ceil over the component's
    true sample dims (T.81 A.2.2), NOT the MCU-padded grid."""
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _decode_prog_scan(
    data, pos, w, h, comps, scan_comps, coefs, huff,
    ss, se, ah, al, restart_interval, eobrun,
):
    """One progressive scan (T.81 G.2): DC or AC band, first or
    refinement pass.  Mutates ``coefs`` in place; returns the byte
    position of the next marker."""
    mcux, mcuy, hmax, vmax = _mcu_grid(comps, w, h)
    r = _BitReader(data, pos)
    eobrun[0] = 0
    pred = [0] * len(comps)
    n_units = 0

    def restart_if_due() -> None:
        nonlocal pred
        if restart_interval and n_units and n_units % restart_interval == 0:
            r.aligned_restart()
            pred = [0] * len(comps)
            eobrun[0] = 0

    if ss == 0:  # DC scan (interleaved over MCUs when several comps)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        if len(scan_comps) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    restart_if_due()
                    n_units += 1
                    for sc in scan_comps:
                        for by in range(sc["v"]):
                            for bx in range(sc["h"]):
                                blk = coefs[sc["ci"]][
                                    my * sc["v"] + by, mx * sc["h"] + bx
                                ]
                                _dc_unit(r, blk, sc, huff, pred, ah, al)
        else:
            sc = scan_comps[0]
            bw, bh = _nonint_dims(sc, w, h, hmax, vmax)
            for by in range(bh):
                for bx in range(bw):
                    restart_if_due()
                    n_units += 1
                    _dc_unit(r, coefs[sc["ci"]][by, bx], sc, huff, pred, ah, al)
    else:  # AC scan: always one component, non-interleaved
        if len(scan_comps) != 1:
            raise ValueError("interleaved AC progressive scan")
        sc = scan_comps[0]
        ac = huff[(1, sc["ta"])]
        bw, bh = _nonint_dims(sc, w, h, hmax, vmax)
        for by in range(bh):
            for bx in range(bw):
                restart_if_due()
                n_units += 1
                blk = coefs[sc["ci"]][by, bx]
                if ah == 0:
                    _ac_first(r, blk, ac, ss, se, al, eobrun)
                else:
                    _ac_refine(r, blk, ac, ss, se, al, eobrun)
    # skip any padding to the next marker (0xFF followed by a real
    # marker byte; stuffed 0xFF00 belongs to entropy data)
    p = r.pos
    while p < len(data) and not (
        data[p] == 0xFF and p + 1 < len(data) and data[p + 1] not in (0x00,)
    ):
        p += 1
    return p


def _dc_unit(r, blk, sc, huff, pred, ah, al) -> None:
    if ah == 0:  # first pass: Huffman-coded diffs of the shifted DC
        s = _read_huff(r, huff[(0, sc["td"])])
        pred[sc["ci"]] += _receive_extend(r, s)
        blk[0] = pred[sc["ci"]] << al
    else:  # refinement: one raw bit appended in two's complement
        if r.bit():
            blk[0] |= 1 << al
            # numpy int32 |= handles negatives in two's complement,
            # matching the spec's successive-approximation append


def _ac_first(r, blk, ac, ss, se, al, eobrun) -> None:
    """AC band, first pass at this bit position (G.2.2): runs of
    zeros, EOBn run-length codes spanning blocks."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_huff(r, ac)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run < 15:  # EOBn: 2^run + extra bits blocks end here
                eobrun[0] = (1 << run) - 1
                if run:
                    eobrun[0] += r.bits(run)
                return
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _receive_extend(r, size) << al
        k += 1


def _ac_refine(r, blk, ac, ss, se, al, eobrun) -> None:
    """AC band refinement (G.2.3, the libjpeg decode_mcu_AC_refine
    shape): newly-nonzero coefficients arrive as ±1 at this bit
    position; every nonzero-history coefficient crossed — including
    the post-EOB sweep — consumes one correction bit."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _read_huff(r, ac)
            run, size = rs >> 4, rs & 0xF
            val = 0
            if size == 0:
                if run < 15:
                    eobrun[0] = 1 << run
                    if run:
                        eobrun[0] += r.bits(run)
                    break
                # ZRL: cross 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError("AC refinement size != 1")
                val = p1 if r.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refinement index overflow")
                blk[k] = val
            k += 1
    if eobrun[0] > 0:  # post-EOB correction sweep
        while k <= se:
            if blk[k] != 0 and r.bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun[0] -= 1


def _assemble_progressive(coefs, comps, qt, w, h):
    """Dequantize + IDCT the accumulated coefficient store and finish
    exactly like the baseline path (upsample + color convert)."""
    mcux, mcuy, hmax, vmax = _mcu_grid(comps, w, h)
    planes = []
    for ci, c in enumerate(comps):
        bh, bw, _ = coefs[ci].shape
        plane = np.zeros((bh * 8, bw * 8))
        q = qt[c["tq"]]
        for by in range(bh):
            for bx in range(bw):
                zz = coefs[ci][by, bx]
                coef = np.empty(64)
                for i in range(64):
                    coef[ZIGZAG[i]] = zz[i]
                coef = (coef * q).reshape(8, 8)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ coef @ _C + 128.0
                )
        planes.append(plane)
    return _finish_planes(planes, comps, w, h, hmax, vmax)


def _finish_planes(planes, comps, w, h, hmax, vmax):
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            # index-mapped nearest-neighbor upsample: full-res (x, y)
            # reads comp sample (x·h/hmax, y·v/vmax).  Equals the
            # np.repeat replication for divisor ratios and also
            # handles non-divisor factor pairs (3-vs-2, 4-vs-3),
            # which T.81 permits
            ys = np.minimum((np.arange(h) * c["v"]) // vmax, p.shape[0] - 1)
            xs = np.minimum((np.arange(w) * c["h"]) // hmax, p.shape[1] - 1)
            full.append(p[np.ix_(ys, xs)])
            continue
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(full[0], 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return w, h, 3, np.clip(rgb, 0, 255).astype(np.uint8).tobytes()


def _decode_scan(data, pos, w, h, comps, qt, huff, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.aligned_restart()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        s = _read_huff(r, huff[(0, c["td"])])
                        diff = _receive_extend(r, s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        ac = huff[(1, c["ta"])]
                        while k < 64:
                            rs = _read_huff(r, ac)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _receive_extend(r, size)
                            k += 1
                        coef = np.empty(64)
                        for i in range(64):
                            coef[ZIGZAG[i]] = zz[i]
                        coef = (coef * qt[c["tq"]]).reshape(8, 8)
                        block = _C.T @ coef @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    return _finish_planes(planes, comps, w, h, hmax, vmax)


def _read_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")
