"""windowFunnel — all four ClickHouse modes (SURVEY §2.D sequence
family next to q_seq_match / q_funnel, which cover the unbounded
any-gap subsequence form as chained conditional aggregates).

ClickHouse ``windowFunnel(window[, mode, ...])(ts, cond1, cond2, ...)``
scan semantics, per the engine's documented examples:

- **default**: events matching no condition are ignored; within the
  stream the chain is a SUBSEQUENCE whose step k must land within
  ``window`` seconds of the chain-start timestamp inherited through
  level k-1 (a new cond1 event restarts the chain-start clock).
- **strict_order**: additionally, the scan ABORTS (returning the
  levels achieved so far) at the first "intervening" event after a
  cond1 event has been seen — an event matching NO condition (docs:
  ``A->B->D->C`` gives 2; ``v,s,v,c,p`` gives 1), or an event matching
  a step whose PREVIOUS level is unachieved (the engine's out-of-order
  branch: ``v,p,...`` aborts at the premature p with level 1; an
  in-window-failed chain counts as achieved=false, so a late p aborts
  too).  Non-matching events BEFORE the first cond1 are skipped, and a
  repeated condition re-matches its level (``v,c,c,p`` gives 3).
- **strict_dedup**: a condition RE-matching an already-achieved level
  stops the scan at that event and returns ITS level (docs: in
  ``A->B->B->C`` the search stops at the second B, level 2); repeated
  cond1 events never trigger this (they reset the chain start).  A
  COMPLETED funnel returns immediately (the engine's
  ``event_idx + 1 == events_size`` early return), so duplicates after
  completion never lower the result.
- **strict_increase**: step k only advances on a timestamp STRICTLY
  greater than the timestamp of the event that achieved level k-1
  (ties don't advance).

Spark-first shape: the engine's greedy DP keeps, per level, the
(chain-start, achieving-event) timestamps of the LAST event that
reached it.  Both components are non-decreasing in scan order (level 0
stores the latest cond1 timestamp; each higher level inherits the
start from a monotone sequence and is achieved at monotone scan
times), so "last" = "max" — the whole sequential DP collapses into K
chained running-``max`` window columns over ONE per-user sort, plus
two partition-wide extrema for the strict_order abort point and one
``min_by`` for the strict_dedup stop.  State is bounded by the number
of steps, never a per-user event buffer (the engine's own aggregate
state buffers every matching event per user — this form is strictly
smaller), and every expression is JVM-side whole-stage codegen: the
100 TB shape (one user_id exchange, one sort, K window passes, one
hash aggregate).

Multi-match (overlapping step conditions): the engine's aggregate
inserts one ``(timestamp, step)`` ENTRY per condition an event
matches (in condition-index order) and scans the entry list — one
event can advance several pending levels.  ``multi_match=True``
reproduces exactly that: each row explodes into one entry per matched
step (plus a no-match sentinel entry, which strict_order's abort
needs), the step index joins the sort order as the intra-event
tiebreaker, and the same running-max DP runs over the entry stream —
on which the conditions ARE mutually exclusive by construction.  The
default (``multi_match=False``) skips the explode for the common
real-funnel case of distinct event types; ``check_exclusive=True``
turns the documented exclusivity precondition into a raised error
instead of a silent engine divergence.  Same-timestamp events are
ordered by the caller's unique tiebreaker rather than the engine's
nondeterministic merge-order ties — a documented determinism
improvement.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MODES = frozenset({"strict_order", "strict_dedup", "strict_increase"})


def window_funnel(
    df: DataFrame,
    user_col: str,
    order: Sequence[str],
    steps: Sequence[Column],
    ts_col: str | None = None,
    window_s: float | None = None,
    modes: Sequence[str] = (),
    multi_match: bool = False,
    check_exclusive: bool = False,
) -> DataFrame:
    """Per-user funnel level under ClickHouse windowFunnel semantics.

    ``steps``: boolean Columns, one per funnel step, each evaluated on
    a single event row (e.g. ``F.col("event_type") == "view"``);
    unless ``multi_match=True`` they must be mutually exclusive per
    row (module docstring; ``check_exclusive=True`` enforces it with
    one extra validation job).  ``order`` must be a total order per
    user (include a unique tiebreaker) so both engines walk the same
    stream.  ``modes``: any combination of ``strict_order``,
    ``strict_dedup``, ``strict_increase`` (module docstring).  With
    ``window_s`` set, step k (k>=2) only advances if its event lies
    within ``window_s`` seconds of the chain-start timestamp inherited
    through level k-1; ``ts_col`` is then required (compared as
    fractional epoch seconds, which both Spark's ``cast("double")``
    and DuckDB's ``epoch()`` preserve exactly at microsecond
    precision).  ``strict_increase`` also requires ``ts_col``.

    Returns (user_col, level): the highest step reached (0 if cond1
    never fires), clipped by the strict_order abort / strict_dedup
    stop when those modes are on.
    """
    modes = frozenset(modes)
    bad = modes - _MODES
    if bad:
        raise ValueError(f"unknown windowFunnel mode(s): {sorted(bad)}")
    needs_ts = window_s is not None or "strict_increase" in modes
    if needs_ts and ts_col is None:
        raise ValueError("window_s / strict_increase requires ts_col")

    if multi_match:
        # the engine's entry-list model (module docstring): one row
        # per (event, matched step) in condition-index order, plus a
        # single -1 sentinel for no-match events (strict_order's
        # intervening-event abort must still see them).  The DP below
        # then runs on conditions that are exclusive BY CONSTRUCTION.
        matched = F.filter(
            F.array(
                *[
                    F.when(
                        F.coalesce(c.cast("boolean"), F.lit(False)),
                        F.lit(k),
                    )
                    for k, c in enumerate(steps)
                ]
            ),
            lambda x: x.isNotNull(),
        )
        entries = F.when(F.size(matched) > 0, matched).otherwise(
            F.array(F.lit(-1))
        )
        expanded = df.withColumn("__step", F.explode(entries))
        return window_funnel(
            expanded,
            user_col,
            [*order, "__step"],
            [F.col("__step") == k for k in range(len(steps))],
            ts_col=ts_col,
            window_s=window_s,
            modes=modes,
        )
    if check_exclusive:
        nmatch = reduce(
            lambda a, b: a + b,
            [
                F.coalesce(c.cast("boolean"), F.lit(False)).cast("int")
                for c in steps
            ],
        )
        if df.where(nmatch >= 2).limit(1).count():
            raise ValueError(
                "step conditions overlap (an event matches >=2 steps): "
                "windowFunnel's single-match DP would silently diverge "
                "from the engine — pass multi_match=True"
            )
    ts = (
        F.col(ts_col).cast("double")
        if ts_col is not None
        else F.lit(None).cast("double")
    )

    w_ord = Window.partitionBy(user_col).orderBy(*order)
    w_all = Window.partitionBy(user_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)

    flags = [c.cast("boolean") for c in steps]
    match_any = reduce(
        lambda a, b: a | b, [F.coalesce(f, F.lit(False)) for f in flags]
    )

    base = df.select(
        F.col(user_col),
        *[F.col(c) for c in order if c != user_col],
        ts.alias("__t"),
        *[f.alias(f"__f{k}") for k, f in enumerate(flags)],
        match_any.alias("__m"),
    ).withColumn("__rn", F.row_number().over(w_ord))

    strict_order = "strict_order" in modes
    if strict_order:
        # the scan "arms" at the first cond1 event; before it,
        # non-matching events are skipped and premature step-k events
        # are no-ops.  Abort points are computed AFTER the DP (they
        # need its state); quals are gated on armed only — rows past
        # the first abort compute garbage that the stop logic discards
        base = base.withColumn(
            "__first1",
            F.min(F.when(F.col("__f0"), F.col("__rn"))).over(w_all),
        )
        valid = F.col("__first1").isNotNull() & (
            F.col("__rn") >= F.col("__first1")
        )
    else:
        valid = F.lit(True)
    base = base.withColumn("__valid", valid)

    # greedy DP as chained running maxima: __a{k} at a row = best
    # chain-start timestamp available to step k+1 from STRICTLY
    # preceding rows (the engine inherits the stored start; starts are
    # non-decreasing, so max ≡ last); __e{k} = timestamp of the last
    # event that achieved level k+1 (monotone in scan order for the
    # same reason), which strict_increase compares strictly.  Without
    # a window bound the start value itself is irrelevant — carry the
    # ordinal __rn so the same code path serves both (ts may be
    # NULL-typed then).
    start0 = F.col("__t") if window_s is not None else F.col("__rn").cast("double")
    inc = "strict_increase" in modes
    qual = [F.col("__valid") & F.col("__f0")]
    base = base.withColumn("__a0", F.max(F.when(qual[0], start0)).over(w_prev))
    if inc:
        # with a window bound, start0 IS __t, so __e0 would be the
        # exact same running max as __a0 — alias instead of paying a
        # second window aggregate
        base = base.withColumn(
            "__e0",
            F.col("__a0")
            if window_s is not None
            else F.max(F.when(qual[0], F.col("__t"))).over(w_prev),
        )
    for k in range(1, len(flags)):
        prev = F.col(f"__a{k - 1}")
        ok = F.col("__valid") & F.col(f"__f{k}") & prev.isNotNull()
        if window_s is not None:
            ok = ok & (F.col("__t") <= prev + F.lit(float(window_s)))
        if inc:
            ok = ok & (F.col("__t") > F.col(f"__e{k - 1}"))
        qual.append(ok)
        if k < len(flags) - 1:
            base = base.withColumn(
                f"__a{k}", F.max(F.when(ok, prev)).over(w_prev)
            )
            if inc:
                base = base.withColumn(
                    f"__e{k}", F.max(F.when(ok, F.col("__t"))).over(w_prev)
                )

    level = F.lit(0)
    for k, ok in enumerate(qual):
        level = F.when(ok, F.lit(k + 1)).otherwise(level)
    base = base.withColumn("__lvl", level)

    # ---- early-return events.  The engine's scan stops at the FIRST
    # of (disjoint per row — steps are mutually exclusive):
    #   completion — a row reaching the top level returns K outright
    #     (only consequential under strict_dedup: it shields trailing
    #     duplicates; without dedup the per-user max is K either way);
    #   strict_order aborts — a non-matching row after arming, OR a
    #     step-k (k>=2) row whose previous level is UNACHIEVED (the
    #     engine's out-of-order branch returns the levels-so-far
    #     count) — both return the max level before the abort row;
    #   strict_dedup stop — a step-k (k>=2) row whose OWN level is
    #     already achieved returns that row's level.
    # Rows at/after the first stop carry garbage DP state; every
    # consumer below discards them via the earliest-stop comparison.
    dedup = "strict_dedup" in modes
    k_top = len(flags)

    agg_cols = []
    result_when = []  # (stop_rn scalar column name, value column)

    if dedup:
        agg_cols.append(
            F.min(F.when(qual[-1], F.col("__rn"))).alias("__comp_rn")
        )
        # a dup at step k+1: the row's own level was achieved strictly
        # before — __a{k} carries that for inner levels; the last
        # level computes it on demand
        dup_level = F.lit(None).cast("int")
        for k in range(1, len(flags)):
            if k < len(flags) - 1:
                achieved = F.col(f"__a{k}").isNotNull()
            else:
                achieved = (
                    F.max(F.when(qual[k], F.lit(1))).over(w_prev).isNotNull()
                )
            is_dup = F.col(f"__f{k}") & F.col("__valid") & achieved
            dup_level = F.when(is_dup, F.lit(k + 1)).otherwise(dup_level)
        base = base.withColumn("__dup_lvl", dup_level).withColumn(
            "__dup_rn", F.when(dup_level.isNotNull(), F.col("__rn"))
        )
        agg_cols.append(F.min("__dup_rn").alias("__dup_first_rn"))
        agg_cols.append(
            F.min_by("__dup_lvl", "__dup_rn").alias("__dup_first_lvl")
        )

    if strict_order:
        armed_after = F.col("__rn") > F.col("__first1")
        prem = F.lit(False)
        for k in range(1, len(flags)):
            prem = prem | (
                F.col(f"__f{k}") & F.col(f"__a{k - 1}").isNull()
            )
        brk_marker = armed_after & (~F.col("__m") | prem)
        # the abort rn must be a per-ROW column (the pre-abort max
        # compares each row against it inside the aggregate)
        base = base.withColumn(
            "__brk_rn",
            F.min(F.when(brk_marker, F.col("__rn"))).over(w_all),
        )
        agg_cols.append(F.min("__brk_rn").alias("__brk_first_rn"))
        agg_cols.append(
            F.max(
                F.when(
                    F.col("__brk_rn").isNull()
                    | (F.col("__rn") < F.col("__brk_rn")),
                    F.col("__lvl"),
                )
            ).alias("__max_pre_brk")
        )

    agg_cols.append(F.max("__lvl").alias("__max_all"))
    per_user = base.groupBy(user_col).agg(*agg_cols)

    stops = []
    if dedup:
        stops.append("__comp_rn")
        stops.append("__dup_first_rn")
        result_when.append(("__comp_rn", F.lit(k_top)))
        result_when.append(("__dup_first_rn", F.col("__dup_first_lvl")))
    if strict_order:
        stops.append("__brk_first_rn")
        result_when.append(("__brk_first_rn", F.col("__max_pre_brk")))

    if not stops:
        return per_user.select(
            F.col(user_col), F.col("__max_all").cast("int").alias("level")
        )
    earliest = F.least(*[F.col(c) for c in stops]) if len(stops) > 1 else F.col(stops[0])
    result = F.col("__max_all")
    for rn_col, value in reversed(result_when):
        result = F.when(
            F.col(rn_col).isNotNull() & (F.col(rn_col) == earliest), value
        ).otherwise(result)
    return per_user.select(
        F.col(user_col), F.coalesce(result, F.lit(0)).cast("int").alias("level")
    )


def window_funnel_strict(
    df: DataFrame,
    user_col: str,
    order: Sequence[str],
    steps: Sequence[Column],
    ts_col: str | None = None,
    window_s: float | None = None,
) -> DataFrame:
    """``window_funnel`` in strict_order mode (the round-9/10 form the
    registered q_funnel_strict / q_funnel_strict_window use)."""
    return window_funnel(
        df,
        user_col,
        order,
        steps,
        ts_col=ts_col,
        window_s=window_s,
        modes=("strict_order",),
    )
