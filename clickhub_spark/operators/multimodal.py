"""Multimodal column operators (north star): image/audio/video
payloads as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio codecs, so the decode step is a
STUB (deterministic fake features) behind ``decode_fn`` — the Spark-
side plumbing is real and tested: schema contract, Arrow batch
iteration, partition-size control, and the metadata columns a 100 TB
media pipeline needs before any decode (size, hash, type tag) so
pruning happens on cheap columns first.

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


def resize_images(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas resize pass: emits (id, resized binary, w, h).

    Runs before feature extraction in a real pipeline so the decode
    UDF sees fixed-size inputs (stable Arrow batch memory)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": [stub_resize(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return src.mapInPandas(run, "doc_id long, resized binary, width int, height int")


def sample_frames(
    df: DataFrame,
    every_nth: int = 4,
    max_frames: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling for video-like payloads: one row per sampled
    frame (id, frame_idx, frame bytes).  The STUB treats the payload
    as a concatenation of fixed-size 16-byte 'frames'; real decoders
    swap in keyframe extraction.  This is the UDTF-shaped multimodal
    op: one row → many, schema-stable for downstream joins."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    frame_sz = 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    raise NotImplementedError("real frame sampling requires codecs")
                total = len(p) // frame_sz
                for j, f in enumerate(range(0, total, every_nth)):
                    if j >= max_frames:
                        break
                    ids.append(i)
                    idxs.append(f)
                    frames.append(bytes(p[f * frame_sz : (f + 1) * frame_sz]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    out = src.mapInPandas(run, "doc_id long, frame_idx int, frame binary")
    return out


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], list[float]] = stub_decode,
    batch_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Emits (id, media_type, n_bytes, feat) — the downstream join key +
    prune columns + fixed-width features.
    """
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
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "feat": [decode_fn(p) for p in pdf["payload"]],
                }
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)


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
