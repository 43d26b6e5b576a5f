"""windowFunnel, strict_order mode — ClickHouse
``windowFunnel(window, 'strict_order')(ts, cond1, cond2, ...)``
(SURVEY §2.D sequence family next to q_seq_match / q_funnel, which
cover the default any-gap subsequence mode).

True ClickHouse scan semantics (round-10 rewrite, ADVICE r9 #1 — the
r9 form computed "longest consecutive-run prefix", divergent in both
directions from the engine it claimed to port):

- Events are scanned per user in time order.  Events matching NO
  condition ("others") are skipped while no chain has started; the
  FIRST other-event after a cond1 event has been seen ABORTS the whole
  scan (docs: ``A->B->D->C`` gives level 2; ``v,s,v,c,p`` gives 1).
- Within the scanned prefix the chain is a SUBSEQUENCE, not an
  adjacency run: events matching a LATER condition never break or
  stall the chain, and a repeated condition re-matches its level
  (``v,c,c,p`` gives 3).
- With ``window`` set, step k advances only if its timestamp is within
  ``window`` seconds of the chain-start timestamp stored at level k-1;
  a new cond1 event restarts the chain-start clock.

Spark-first shape: the engine's greedy DP keeps, per level, the
chain-start timestamp of the LAST event that reached it.  Chain starts
are non-decreasing in scan order (level 0 stores the latest cond1
timestamp; each higher level inherits it), so "last" = "max" — the
whole sequential DP collapses into K chained running-``max`` window
columns over ONE per-user sort, plus two partition-wide extrema for
the abort point.  State is bounded by the number of steps, never a
per-user event buffer (the engine's own aggregate state buffers every
matching event per user — this form is strictly smaller), and every
expression is JVM-side whole-stage-codegen: the 100 TB shape.

Restriction vs the engine: step conditions must be mutually exclusive
per event (one event advancing two consecutive levels via multi-match
is not modeled).  The registered funnels use distinct event types, as
real funnels do.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_funnel_strict(
    df: DataFrame,
    user_col: str,
    order: Sequence[str],
    steps: Sequence[Column],
    ts_col: str | None = None,
    window_s: float | None = None,
) -> DataFrame:
    """Per-user funnel level under ClickHouse strict_order semantics.

    ``steps``: boolean Columns, one per funnel step, each evaluated on
    a single event row (e.g. ``F.col("event_type") == "view"``) and
    mutually exclusive per row.  ``order`` must be a total order per
    user (include a unique tiebreaker) so both engines walk the same
    stream.  With ``window_s`` set, step k (k>=2) only advances if its
    event lies within ``window_s`` seconds of the chain-start
    timestamp inherited through level k-1 (the ClickHouse ``window``
    argument; chain starts reset at each new cond1 event); ``ts_col``
    is then required (compared as fractional epoch seconds, which both
    Spark's ``cast("double")`` and DuckDB's ``epoch()`` preserve
    exactly at microsecond precision).

    Returns (user_col, level): level = highest step reached before the
    scan aborts at the first non-matching event following a cond1
    event; 0 if cond1 never fires before the abort.
    """
    if window_s is not None and ts_col is None:
        raise ValueError("window_s requires ts_col")
    if ts_col is None:
        # the scan itself is ordinal; a timestamp is only needed for
        # the window bound, but the DP below is written over ts for
        # one code path — synthesize from the ordering when absent
        ts = F.lit(None).cast("double")
    else:
        ts = F.col(ts_col).cast("double")

    w_ord = Window.partitionBy(user_col).orderBy(*order)
    w_all = Window.partitionBy(user_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)

    flags = [c.cast("boolean") for c in steps]
    match_any = reduce(lambda a, b: a | b, [F.coalesce(f, F.lit(False)) for f in flags])

    base = df.select(
        F.col(user_col),
        *[F.col(c) for c in order if c != user_col],
        ts.alias("__t"),
        *[f.alias(f"__f{k}") for k, f in enumerate(flags)],
        match_any.alias("__m"),
    ).withColumn("__rn", F.row_number().over(w_ord))
    # abort point: the first non-matching event at/after the first
    # cond1 event (the cond1 event itself matches, so ">= first1" and
    # "> first1" coincide; scan order = __rn)
    base = base.withColumn(
        "__first1", F.min(F.when(F.col("__f0"), F.col("__rn"))).over(w_all)
    )
    base = base.withColumn(
        "__brk",
        F.min(
            F.when(~F.col("__m") & (F.col("__rn") > F.col("__first1")), F.col("__rn"))
        ).over(w_all),
    )
    valid = (
        F.col("__first1").isNotNull()
        & (F.col("__rn") >= F.col("__first1"))
        & (F.col("__brk").isNull() | (F.col("__rn") < F.col("__brk")))
    )
    base = base.withColumn("__valid", valid)

    # greedy DP as chained running maxima: __a{k} at a row = best
    # chain-start timestamp available to step k+1 from STRICTLY
    # preceding rows (ClickHouse inherits the stored start; starts are
    # non-decreasing, so max ≡ last).  Without a window bound the
    # start value itself is irrelevant — carry the ordinal __rn so the
    # same code path serves both (ts may be NULL-typed then).
    start0 = F.col("__t") if window_s is not None else F.col("__rn").cast("double")
    qual = [F.col("__valid") & F.col("__f0")]
    base = base.withColumn(
        "__a0", F.max(F.when(qual[0], start0)).over(w_prev)
    )
    for k in range(1, len(flags)):
        prev = F.col(f"__a{k - 1}")
        ok = F.col("__valid") & F.col(f"__f{k}") & prev.isNotNull()
        if window_s is not None:
            ok = ok & (F.col("__t") <= prev + F.lit(float(window_s)))
        qual.append(ok)
        if k < len(flags) - 1:
            base = base.withColumn(
                f"__a{k}", F.max(F.when(ok, prev)).over(w_prev)
            )

    level = F.lit(0)
    for k, ok in enumerate(qual):
        level = F.when(ok, F.lit(k + 1)).otherwise(level)
    return (
        base.select(F.col(user_col), level.alias("__lvl"))
        .groupBy(user_col)
        .agg(F.max("__lvl").cast("int").alias("level"))
    )
