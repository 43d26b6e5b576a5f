"""Storage introspection — the ``system.parts`` analog: per-file and
per-partition-directory stats for a parquet table, read from parquet
footers via pyarrow (no Spark job, no data scan — footer metadata
only, the same way system.parts reads part headers)."""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class PartInfo:
    partition: str  # relative partition dir ("" for unpartitioned files)
    file: str
    rows: int
    bytes: int
    row_groups: int


def table_parts(path: str) -> list[PartInfo]:
    """One PartInfo per data file under ``path`` (recursive, so
    partition directories and __batch_id dirs are covered)."""
    import pyarrow.parquet as pq

    parts: list[PartInfo] = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            meta = pq.ParquetFile(full).metadata
            parts.append(
                PartInfo(
                    partition=os.path.relpath(root, path).replace(".", ""),
                    file=f,
                    rows=meta.num_rows,
                    bytes=os.path.getsize(full),
                    row_groups=meta.num_row_groups,
                )
            )
    return parts


def table_stats(path: str) -> dict:
    """Aggregate table stats: {rows, bytes, files, partitions} —
    the numbers an operator checks before/after compact() or
    optimize_final()."""
    parts = table_parts(path)
    return {
        "rows": sum(p.rows for p in parts),
        "bytes": sum(p.bytes for p in parts),
        "files": len(parts),
        "partitions": len({p.partition for p in parts}),
    }
