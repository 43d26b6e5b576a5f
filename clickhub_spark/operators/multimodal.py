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
