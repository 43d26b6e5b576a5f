"""Streaming maintenance for a CollapsingMergeTree-style state table —
the CDC retract-stream shape: a changelog of ``+1`` state / ``-1``
cancel rows arrives continuously, and readers want the collapsed FINAL
view kept fresh (≙ ClickHouse absorbing inserts into a Collapsing
table and collapsing lazily at merge/FINAL time; engine family
reference README.md:132-134).

Same no-streaming-state design as the stars MV (streaming/
freshness.py): each micro-batch appends its batch-local ACCUMULATOR
(operators/collapsing.collapse_accumulate — the mergeable
(net, last_state, first_cancel) monoid, NOT the finalized view, which
is lossy and cannot be re-merged), and readers collapse partials with
``collapse_merge`` + ``collapse_finalize``.  State lives in the table,
bounded by keys-per-batch; the stream never holds a growing hash of
all keys — the 100 TB shape.

At-least-once safety: foreachBatch may replay a batch after a crash
between write and checkpoint commit, so each batch OVERWRITES its own
``batch_id=<id>`` partition directory — a replay rewrites the same
partials rather than double-counting the net.

``compact_accumulator`` folds all partials into one (``batch_id=-1``)
when the partial count makes the read-time merge noticeable —
the OPTIMIZE analog, same writers-paused contract as
operators/mutate.compact.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from clickhub_spark.operators.collapsing import (
    collapse_accumulate,
    collapse_finalize,
    collapse_merge,
)
from clickhub_spark.streaming.mv import read_event_stream


def maintain_collapsed(
    spark: SparkSession,
    changelog_table: str,
    acc_path: str,
    checkpoint: str,
    schema: StructType,
    keys: Sequence[str],
    sign: str,
    order: Sequence[str],
    max_files: int = 10,
) -> None:
    """Advance the collapsed state to cover all changelog rows
    currently in the table: stream the NEW parquet files (file-source
    checkpoint = the state's high-water mark), append each batch's
    accumulator partial under its own overwrite-on-replay partition."""
    stream = read_event_stream(spark, changelog_table, schema, max_files)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        collapse_accumulate(batch_df, keys, sign, order).write.mode(
            "overwrite"
        ).parquet(f"{acc_path}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_collapsed(
    spark: SparkSession,
    acc_path: str,
    keys: Sequence[str],
    order: Sequence[str],
    schema_hint: str | None = None,
) -> DataFrame:
    """The FINAL read view: merge all accumulator partials and
    finalize.  Returns an empty frame (``schema_hint`` required then)
    before the first batch so callers can poll from t=0."""
    try:
        partials = spark.read.parquet(acc_path).drop("batch_id")
    except Exception:
        if schema_hint is None:
            raise
        return spark.createDataFrame([], schema_hint)
    return collapse_finalize(collapse_merge(partials, keys, order))


def compact_accumulator(
    spark: SparkSession,
    acc_path: str,
    keys: Sequence[str],
    order: Sequence[str],
    target_files: int = 8,
) -> int:
    """Fold every partial into a single merged accumulator partition
    (``batch_id=-1`` — availableNow batch ids only grow, so it never
    collides).  Writers paused during the two-rename swap, same
    contract as operators/mutate.compact.  Returns surviving key
    count."""
    merged = collapse_merge(
        spark.read.parquet(acc_path).drop("batch_id"), keys, order
    )
    tmp = f"{acc_path}.__compacting_{uuid.uuid4().hex[:8]}"
    merged.repartition(target_files).write.mode("overwrite").parquet(
        f"{tmp}/batch_id=-1"
    )
    n = spark.read.parquet(tmp).count()
    old = f"{acc_path}.__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(acc_path, old)
    os.rename(tmp, acc_path)
    shutil.rmtree(old)
    return n
