"""ClickHouse PROJECTION analog: alternate physical layouts of one
table — re-sorted/re-partitioned copies and pre-aggregations — with
automatic query routing to the cheapest copy that can answer.

Reference parity: ClickHouse `ALTER TABLE ... ADD PROJECTION` stores,
inside every part, either rows in a different ORDER BY or a
pre-aggregated GROUP BY state, and the optimizer transparently reads
the projection instead of the base data when a query's predicate or
grouping matches (the reference's stars-by-repo MV, README.md:256-262,
is the hand-rolled version of exactly this).  The Spark-first mapping:

- a SORT projection is a parquet copy written via ``write_sorted`` —
  partition dirs give Catalyst partition pruning and the in-file sort
  gives row-group min/max skipping, the same two pruning levels the
  ClickHouse projection's primary index provides;
- an AGG projection is a parquet copy of a partial GROUP BY whose
  aggregates are MERGEABLE (sum/count/min/max — count re-aggregates as
  sum), so any query grouping by a SUBSET of its keys is answered by
  re-aggregating the tiny copy instead of scanning the fact table —
  AggregatingMergeTree-via-projection;
- a JSON manifest beside the base copy records every layout;
  ``read_for_filter`` / ``read_for_agg`` route per query shape.

Scale notes (100 TB): projections trade write amplification (each
copy is one extra sorted shuffle at ingest, exactly like ClickHouse
projection materialization) for reads that skip the fact scan
entirely.  Routing is a manifest lookup — no data inspection at query
time.  An agg projection's size is bounded by its key cardinality,
not the fact row count, so the re-aggregation is typically a
single-stage broadcast-scale job.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhub_spark.sources.writer import write_sorted

_MANIFEST = "_projections.json"

# merge function applied when re-aggregating a stored partial aggregate
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_RAW = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


@dataclass(frozen=True)
class SortProjection:
    """Alternate clustering: optional partition dir column + sort key."""

    name: str
    sort_cols: tuple[str, ...]
    partition_by: str | None = None


@dataclass(frozen=True)
class AggProjection:
    """Pre-aggregation: ``aggs`` maps output alias -> (fn, col) with
    fn in sum/count/min/max (the mergeable set)."""

    name: str
    group_cols: tuple[str, ...]
    aggs: dict[str, tuple[str, str]]


def materialize(
    df: DataFrame,
    base_dir: str,
    projections: list[SortProjection | AggProjection],
) -> None:
    """Write the base copy plus every projection under ``base_dir``
    and record the manifest.  Idempotent per directory (overwrite)."""
    df.write.mode("overwrite").parquet(os.path.join(base_dir, "base"))
    meta = []
    for p in projections:
        pdir = os.path.join(base_dir, f"proj_{p.name}")
        if isinstance(p, SortProjection):
            write_sorted(
                df, pdir, p.partition_by, list(p.sort_cols), mode="overwrite"
            )
            meta.append(
                {
                    "kind": "sort",
                    "name": p.name,
                    "sort_cols": list(p.sort_cols),
                    "partition_by": p.partition_by,
                }
            )
        else:
            unknown = {fn for fn, _ in p.aggs.values()} - set(_RAW)
            if unknown:
                raise ValueError(f"non-mergeable agg fns {unknown!r}")
            partial = df.groupBy(*p.group_cols).agg(
                *(
                    _RAW[fn](F.expr(col)).alias(alias)
                    for alias, (fn, col) in p.aggs.items()
                )
            )
            partial.write.mode("overwrite").parquet(pdir)
            meta.append(
                {
                    "kind": "agg",
                    "name": p.name,
                    "group_cols": list(p.group_cols),
                    "aggs": {a: list(v) for a, v in p.aggs.items()},
                }
            )
    with open(os.path.join(base_dir, _MANIFEST), "w") as fh:
        json.dump({"projections": meta}, fh, indent=1)


def _manifest(base_dir: str) -> list[dict]:
    with open(os.path.join(base_dir, _MANIFEST)) as fh:
        return json.load(fh)["projections"]


def read_for_filter(
    spark: SparkSession, base_dir: str, pred_cols: list[str]
) -> tuple[DataFrame, str]:
    """Route a filter-shaped query: prefer a sort projection whose
    PARTITION column is predicated (dir-level pruning — entire
    partitions never listed), else one whose leading sort column is
    (row-group min/max skipping), else the base copy.  Returns
    (frame, chosen name); the frame is row-identical to the base table
    so the caller's filter works unchanged on any route."""
    preds = set(pred_cols)

    def aligned(name: str) -> DataFrame:
        # read the projection under the BASE's schema and column
        # order: a hive-partitioned copy otherwise (a) re-infers the
        # partition column's type from the dir names (a numeric-string
        # value like '07' comes back as int 7, so the caller's string
        # filter silently matches nothing on this route only) and
        # (b) moves the partition column to the end of the schema —
        # either way the routed frame stops being row-identical
        base_schema = spark.read.parquet(
            os.path.join(base_dir, "base")
        ).schema
        df = spark.read.schema(base_schema).parquet(
            os.path.join(base_dir, f"proj_{name}")
        )
        return df.select(*[f.name for f in base_schema.fields])

    sorts = [m for m in _manifest(base_dir) if m["kind"] == "sort"]
    for m in sorts:
        if m["partition_by"] and m["partition_by"] in preds:
            return aligned(m["name"]), m["name"]
    # among sort-key matches, a globally-sorted copy beats a
    # partitioned one: its row-group min/max ranges are disjoint
    # table-wide, not merely within each partition dir
    for m in sorted(sorts, key=lambda m: m["partition_by"] is not None):
        if m["sort_cols"] and m["sort_cols"][0] in preds:
            return aligned(m["name"]), m["name"]
    return spark.read.parquet(os.path.join(base_dir, "base")), "base"


def read_for_agg(
    spark: SparkSession,
    base_dir: str,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
) -> tuple[DataFrame, str]:
    """Route an aggregation: if some agg projection groups by a
    SUPERSET of ``group_cols`` and stores every requested aggregate,
    re-aggregate its (small) copy with the merge functions; otherwise
    compute from the base copy.  Either route returns the FINAL
    aggregate — identical values, so callers (and oracles) are
    route-agnostic."""
    for m in _manifest(base_dir):
        if m["kind"] != "agg" or not set(group_cols) <= set(m["group_cols"]):
            continue
        stored = {a: tuple(v) for a, v in m["aggs"].items()}
        if not all(stored.get(a) == spec for a, spec in aggs.items()):
            continue
        part = spark.read.parquet(os.path.join(base_dir, f"proj_{m['name']}"))
        merged = part.groupBy(*group_cols).agg(
            *(
                _MERGE[fn](alias).alias(alias)
                for alias, (fn, _col) in aggs.items()
            )
        )
        return merged, m["name"]
    base = spark.read.parquet(os.path.join(base_dir, "base"))
    final = base.groupBy(*group_cols).agg(
        *(_RAW[fn](F.expr(col)).alias(alias) for alias, (fn, col) in aggs.items())
    )
    return final, "base"
