"""Sources & sinks: positional TSV ingest (the types.json statement
analog) and the sorted/partitioned parquet writer (the MergeTree
analog)."""
