"""Approximate heavy hitters — the Space-Saving sketch behind
ClickHouse ``topK``/``topKWeighted`` (reference surface: the exact
group-count form lives in q_topk_freq; THIS is the bounded-memory
form ClickHouse actually computes, for when the key space itself is
too big to group — URLs, shingles, n-grams at 100 TB).

Spark-first shape: one ``mapInPandas`` pass keeps a ``capacity``-entry
Space-Saving summary PER PARTITION (Metwally et al., "Efficient
computation of frequent and top-k elements in data streams"), so the
shuffle carries at most ``capacity`` rows per partition instead of one
row per distinct key.  The merge is the mergeable-summaries form
(Agarwal et al., PODS'12): per-partition summaries are exact-count
upper bounds with a tracked per-counter error, and a partition that
FILLED its summary contributes its minimum counter as the ceiling on
any key it did not report.  The final aggregate therefore yields, for
every reported key, a certified interval [lo, hi] containing the true
count:

- ``est``  = Σ over partitions reporting the key of its counter
  (the usual Space-Saving point estimate),
- ``lo``   = Σ (counter − error)  — counts provably attributed,
- ``hi``   = est + Σ over partitions NOT reporting the key of that
  partition's summary-minimum (0 while a summary never filled).

When no partition ever evicts (capacity ≥ per-partition distinct
keys) every error and every floor is zero, so est = lo = hi = the
exact count — the regime the oracle-checked query runs in; the
adversarial-capacity regime is pinned by tests/test_topk_sketch.py
(SS invariants: hi ≥ true ≥ lo, and any key with true frequency
> N/capacity is reported).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["topk_sketch"]


def _space_saving_rows(key_col: str, capacity: int):
    """Partition worker: fold all Arrow batches into one SS summary,
    emit its counters plus ONE sentinel row (key NULL) carrying the
    partition's absent-key ceiling."""

    def run(batches):
        import pandas as pd

        counts: dict = {}
        errs: dict = {}
        filled = False
        for pdf in batches:
            for key, w in pdf[key_col].value_counts().items():
                w = int(w)
                if key in counts:
                    counts[key] += w
                elif len(counts) < capacity:
                    counts[key] = w
                    errs[key] = 0
                else:
                    filled = True
                    mkey = min(counts, key=counts.get)
                    m = counts.pop(mkey)
                    errs.pop(mkey)
                    counts[key] = m + w
                    errs[key] = m
        floor = min(counts.values()) if (filled and counts) else 0
        keys = list(counts)
        yield pd.DataFrame(
            {
                "key": keys + [None],
                "cnt": [counts[x] for x in keys] + [0],
                "err": [errs[x] for x in keys] + [0],
                "pfloor": [floor] * len(keys) + [floor],
            }
        )

    return run


def topk_sketch(
    df: DataFrame, key_col: str, k: int, capacity: int = 4096
) -> DataFrame:
    """Top-``k`` keys of ``df[key_col]`` by approximate frequency.

    Returns (key, est, lo, hi) ordered by (est DESC, key) — ``key``
    the tiebreaker so the selected row SET is deterministic.  est is
    the Space-Saving point estimate; [lo, hi] is a certified interval
    for the true count (lo = est when no partition evicted near the
    key, hi = est when every partition reported it).  Memory is
    O(capacity) per task and the shuffle carries ≤ capacity·P rows —
    independent of key cardinality, the property that matters when
    the keys are URLs/shingles at 100 TB and exact groupBy state is
    itself the bottleneck.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    rows = df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        _space_saving_rows(key_col, capacity),
        schema="key string, cnt long, err long, pfloor long",
    )
    per_key = (
        rows.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(
            F.sum("cnt").alias("est"),
            F.sum(F.col("cnt") - F.col("err")).alias("lo"),
            F.sum("pfloor").alias("pf"),
        )
    )
    # the absent-key ceiling: partitions that reported the key
    # contribute nothing beyond their counter; partitions that did
    # not contribute at most their summary minimum — total_floor
    # rides a single-row broadcast cross join (house pattern)
    total_floor = rows.where(F.col("key").isNull()).agg(
        F.coalesce(F.sum("pfloor"), F.lit(0)).alias("total_floor")
    )
    return (
        per_key.crossJoin(F.broadcast(total_floor))
        .select(
            "key",
            "est",
            "lo",
            (F.col("est") + F.col("total_floor") - F.col("pf")).alias("hi"),
        )
        .orderBy(F.col("est").desc(), "key")
        .limit(k)
    )
