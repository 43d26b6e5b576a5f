"""Streaming ingestion — the reference's poll→import loop (reference
repo/importer.py:161-179) as a Structured Streaming pipeline:
``readStream`` on a landing directory → ingest-time stamping →
``foreachBatch`` append into the parquet fact table.

Delivery semantics mirror the reference exactly: the file-source
checkpoint gives at-least-once appends (a crashed batch may replay),
and the ReplacingMergeTree-style FINAL read view absorbs the
duplicates — the same "append + dedup-on-read" contract ClickHouse
gives the reference via ReplacingMergeTree (README.md:133) + the
``time > max(time)`` cut (repo/importer.py:95,107).

Scale notes: foreachBatch appends are per-micro-batch parquet writes;
size maxFilesPerTrigger so each batch's output files land near the
row-group sweet spot, and compact small files periodically —
``stream_dedup_ingest(compact_every=N)`` runs sources/writer.compact
on the fact table and the signature store every Nth batch from inside
the sink (the stream is the only writer, satisfying compact()'s
writers-paused contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from clickhub_spark.sources.tsv import stamp_updated_at


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    table_path: str,
    checkpoint: str,
    max_files: int = 4,
    exactly_once: bool = False,
) -> None:
    """Drain everything currently in ``source_dir`` into the table
    (availableNow trigger — deterministic for tests; swap for a
    processingTime trigger in continuous deployments).

    ``exactly_once``: write each micro-batch to its own
    ``__batch_id=<n>/`` partition with overwrite — a replayed batch
    (crash between the write and the checkpoint commit) overwrites
    its own directory instead of appending duplicates.  This is the
    standard idempotent-foreachBatch pattern.  It holds as stated only
    for CHECKPOINT-RESUMED replays, where batch ids (and hence the
    file→batch binning) are stable; a restart from a FRESH checkpoint
    re-reads the whole source and may bin files differently (changed
    ``max_files``, grown directory), so batch 0 of any run first
    clears all existing ``__batch_id=*`` partitions — the stream is
    about to rewrite the full source content, and stale partitions
    from the old binning must not survive next to the new one.  One
    exactly-once table therefore belongs to exactly one stream.  The
    default (plain append) relies on the FINAL dedup view to absorb
    replays, exactly like the ReplacingMergeTree contract."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = stamp_updated_at(batch_df)
        if exactly_once:
            if batch_id == 0:
                import glob
                import shutil

                for stale in glob.glob(f"{table_path}/__batch_id=*"):
                    shutil.rmtree(stale, ignore_errors=True)
            out.write.mode("overwrite").parquet(
                f"{table_path}/__batch_id={batch_id}"
            )
        else:
            out.write.mode("append").parquet(table_path)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    table_path: str,
    store_path: str,
    checkpoint: str,
    text: str = "text",
    id_col: str = "doc_id",
    pairs_path: str | None = None,
    max_files: int = 4,
    compact_every: int = 0,
) -> None:
    """Streaming ingest WITH near-dup screening — the continuous form
    of operators/dedup.incremental_candidate_pairs: every micro-batch
    is LSH-hashed, joined (broadcast) against the historical signature
    store, its near-dup pairs are recorded, and its own signatures are
    APPENDED to the store so later batches dedup against it too.

    State lives in the store (parquet, partitioned by band), not in
    streaming state — restarts resume from the checkpoint and the
    store reflects exactly the batches that committed.  At-least-once
    appends on crash-replay are absorbed downstream: pairs are
    re-derivable duplicates and the store tolerates duplicate
    signature rows (the pair join is distinct).

    ``compact_every=N`` compacts the fact table and the signature
    store after every Nth committed batch (0 disables): long-running
    ingest otherwise accumulates one small parquet file per micro-
    batch per table — the classic small-files scale-killer (footer
    overhead + task-per-file scheduling).  Safe here because the
    foreachBatch sink is the table's only writer (one exactly-once
    table per stream — the compact() concurrency contract); the store
    keeps its band partitioning so the incremental join's partition
    pruning survives compaction."""
    from clickhub_spark.operators.dedup import (
        incremental_candidate_pairs,
        md5_banded_signatures,
    )
    from clickhub_spark.sources.writer import compact

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        import os

        if os.path.isdir(store_path):
            pairs = incremental_candidate_pairs(
                batch_df, store_path, text, id_col
            )
        else:  # first batch: only within-batch pairs
            from clickhub_spark.operators.dedup import minhash_candidate_pairs_md5

            pairs = minhash_candidate_pairs_md5(batch_df, text, id_col)
        if pairs_path:
            pairs.write.mode("append").parquet(pairs_path)
        batch_df.write.mode("append").parquet(table_path)
        md5_banded_signatures(batch_df, text, id_col).write.mode(
            "append"
        ).partitionBy("band").parquet(store_path)
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact(spark, table_path, [id_col])
            compact(spark, store_path, ["bh"], partition_by=["band"])

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_score_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    table_path: str,
    lm_store_path: str,
    checkpoint: str,
    text: str = "text",
    id_col: str = "doc_id",
    max_files: int = 4,
) -> None:
    """Streaming ingest WITH LM quality scoring — the continuous form
    of operators/lm.score_against_store: every micro-batch is scored
    against the persisted bigram model (train-once/score-many; only
    the three small model tables are read per batch) and lands with
    its (n_bigrams, bits) columns attached, so downstream quality
    filtering is a plain column predicate on the stored table.

    Exactly-once per batch: each batch writes its own
    ``__batch_id=<id>`` partition with overwrite, so a crash-replayed
    batch overwrites itself instead of duplicating rows (same contract
    as streaming/freshness.py's MV sink)."""
    from clickhub_spark.operators.lm import score_against_store

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        scored = score_against_store(batch_df, lm_store_path, text, id_col)
        out = batch_df.join(
            scored.select(F.col(id_col), "n_bigrams", "bits"), id_col, "left"
        )
        out.write.mode("overwrite").parquet(
            f"{table_path}/__batch_id={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
