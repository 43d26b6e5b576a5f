"""Mergeable aggregate STATES — the AggregatingMergeTree /
uniqState→uniqMerge half of ClickHouse (reference README.md:133's
engine family; SURVEY §2.D10's sketch counterpart): inserts append
per-group PARTIAL states, reads merge states without ever rescanning
raw data.

Spark 3.5+ exposes Apache DataSketches HLL as first-class mergeable
values: ``hll_sketch_agg`` (build a partial), ``hll_union_agg``
(merge partials), ``hll_sketch_estimate`` (finalize).  That triple is
exactly uniqState / uniqMerge / finalizeAggregation:

  write_uniq_state(...)   ≙ INSERT INTO t SELECT g, uniqState(x)
  merge_uniq_state(...)   ≙ SELECT g', uniqMerge(state) FROM t GROUP BY g'

100 TB shape: the partial table holds one small binary row per
(ingest batch × group), so a year of daily partials over k groups is
365×k rows REGARDLESS of event volume; any coarser rollup (weekly,
global, per-group-only) is a merge over those rows — seconds, not a
rescan of the raw 100 TB.  Appends never touch existing rows, so
ingest is embarrassingly parallel (same contract as the staged-
publish incremental_append).

The sketch binary layout is engine-internal (DataSketches), so
cross-engine value checks are impossible by design; correctness is
pinned by units instead: merged-estimate ≡ global-estimate (state
mergeability), estimate within HLL error of exact distinct, and
append-then-merge ≡ rebuild-from-scratch (incrementality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def uniq_state(
    df: DataFrame, group_cols: list[str], key_col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL partial state (≙ uniqState(key)).  ``lgk`` is the
    DataSketches log2(k) accuracy knob (12 → ~1.6% rel. error)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("uniq_state")
    )


def write_uniq_state(
    df: DataFrame,
    path: str,
    group_cols: list[str],
    key_col: str,
    lgk: int = 12,
) -> None:
    """Append this batch's partial states (the AggregatingMergeTree
    INSERT).  One small binary row per group per call — safe to call
    per ingest batch forever; readers merge."""
    uniq_state(df, group_cols, key_col, lgk).write.mode("append").parquet(path)


def merge_uniq_state(
    spark: SparkSession, path: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge stored partials to any rollup level (≙ uniqMerge at read):
    ``group_cols`` may be any subset of the stored grouping — merging
    IS the rollup, no raw-data rescan.  Empty/None → grand total."""
    partials = spark.read.parquet(path)
    gcols = group_cols or []
    merged = (
        partials.groupBy(*gcols).agg(F.hll_union_agg("uniq_state").alias("u"))
        if gcols
        else partials.agg(F.hll_union_agg("uniq_state").alias("u"))
    )
    return merged.select(
        *gcols, F.hll_sketch_estimate("u").cast("long").alias("uniq_est")
    )
