"""Structured Streaming operators — incremental MV maintenance,
windowed aggregation, watermarks (SURVEY §2.I)."""
