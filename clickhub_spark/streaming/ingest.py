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
row-group sweet spot, and compact small files with a periodic
write_sorted pass (sources/writer.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from clickhub_spark.sources.tsv import stamp_updated_at


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    table_path: str,
    checkpoint: str,
    max_files: int = 4,
) -> None:
    """Drain everything currently in ``source_dir`` into the table
    (availableNow trigger — deterministic for tests; swap for a
    processingTime trigger in continuous deployments)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        stamp_updated_at(batch_df).write.mode("append").parquet(table_path)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
