"""Incremental windowFunnel over Structured Streaming — real-time
funnel levels with the engine's own bounded per-user state (SURVEY
§2.I stateful family × §2.D sequence family; the batch operator is
operators/funnel.py).

Why this shape: ClickHouse serves real-time funnels by re-running the
windowFunnel aggregate over an ever-growing events table; the
streaming form here pays each event ONCE.  Per-user state is exactly
the engine scan's DP — one (chain_start_ts, achieved_ts) pair per
level plus the armed flag and the strict_order/strict_dedup stop — a
fixed-width tuple, so the state store is bounded by user cardinality
at 100 TB, never by event volume (the engine's own aggregate buffers
every matching event per user; this is strictly smaller).

Each micro-batch's rows reach Python as Arrow batches per user
(applyInPandasWithState); rows are sorted within the batch and folded
through the same sequential scan the batch differential test pins
(test_funnel_differential._reference_level_entries).  Output mode
``update``: one (user_id, level) row per user per batch they appear
in; the latest row is the live funnel level.

ORDERING CONTRACT: cross-batch delivery must be per-user
time-ordered (a log-tail/CDC source, or a watermark-delayed
repartitioned feed).  Events are sorted WITHIN each batch; an event
arriving in a later batch with an earlier timestamp than one already
folded is processed in arrival order — the same contract as every
incremental funnel (a late event cannot un-achieve a level the
engine already reported).  For out-of-order histories, run the batch
operator over the table instead.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state: armed flag, stop level (-1 = not stopped), then per level
#: (chain_start_ts, achieved_ts) pairs, NULL-padded to _MAX_STEPS.
_MAX_STEPS = 8
STATE_SCHEMA = "armed boolean, stopped int, " + ", ".join(
    f"s{k} double, e{k} double" for k in range(_MAX_STEPS)
)


def _scan(rows, et, armed, stopped, k_top, window_s, modes):
    """Fold ordered (ts, step) rows through the engine scan.  ``et``:
    list of (start, achieved) or None per level; returns (et, armed,
    stopped) — ``stopped`` >= 0 is the strict_order/strict_dedup
    early-return value (incl. completion under strict_dedup)."""
    strict_order = "strict_order" in modes
    dedup = "strict_dedup" in modes
    inc = "strict_increase" in modes
    for ts, idx in rows:
        if stopped >= 0:
            break
        if idx < 0:
            if strict_order and armed:
                # intervening event: freeze at the levels-so-far count
                lvl = 0
                for k in range(k_top):
                    if et[k] is None:
                        break
                    lvl = k + 1
                stopped = lvl
            continue
        if idx == 0:
            et[0] = (ts, ts)
            armed = True
        elif dedup and et[idx] is not None:
            stopped = idx + 1
        elif strict_order and armed and et[idx - 1] is None:
            lvl = 0
            for k in range(k_top):
                if et[k] is None:
                    break
                lvl = k + 1
            stopped = lvl
        elif et[idx - 1] is not None:
            first_ts, last_ts = et[idx - 1]
            ok = window_s is None or ts <= first_ts + window_s
            if ok and inc:
                ok = last_ts < ts
            if ok:
                et[idx] = (first_ts, ts)
                if dedup and idx + 1 == k_top:
                    stopped = k_top  # completion shields trailing dups
    return et, armed, stopped


def funnel_stream(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_cols: Sequence[str],
    order_cols: Sequence[str] = (),
    window_s: float | None = None,
    modes: Sequence[str] = (),
    user_type: str = "bigint",
) -> DataFrame:
    """Streaming windowFunnel: ``events`` is a streaming DataFrame
    carrying ``user_col``, ``ts_col`` (castable to double seconds),
    the boolean ``step_cols`` (one per funnel step, precomputed by the
    caller — multi-match works by letting several be true on one
    event, exactly the engine's entry model), and ``order_cols`` as
    the within-ties tiebreaker.  Returns an ``update``-mode stream of
    (user_id, level)."""
    k_top = len(step_cols)
    if not 1 <= k_top <= _MAX_STEPS:
        raise ValueError(f"1..{_MAX_STEPS} steps supported, got {k_top}")
    modes = frozenset(modes)
    tiebreak = list(order_cols)

    def update(key, batches, state: GroupState):
        if state.exists:
            raw = state.get
            armed, stopped = bool(raw[0]), int(raw[1])
            et = []
            for k in range(k_top):
                s, e = raw[2 + 2 * k], raw[3 + 2 * k]
                et.append(None if s is None else (float(s), float(e)))
        else:
            armed, stopped = False, -1
            et = [None] * k_top

        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values([ts_col, *tiebreak], kind="mergesort")
        # entry expansion in condition-index order (engine add());
        # events matching nothing become one -1 sentinel entry each
        rows = []
        ts_vals = pdf[ts_col].astype("float64").to_numpy()
        flags = [pdf[c].fillna(False).to_numpy() for c in step_cols]
        for i in range(len(pdf)):
            any_match = False
            for k in range(k_top):
                if flags[k][i]:
                    rows.append((float(ts_vals[i]), k))
                    any_match = True
            if not any_match:
                rows.append((float(ts_vals[i]), -1))
        et, armed, stopped = _scan(
            rows, et, armed, stopped, k_top, window_s, modes
        )

        flat = [armed, stopped]
        for k in range(k_top):
            flat.extend(et[k] if et[k] is not None else (None, None))
        flat.extend([None, None] * (_MAX_STEPS - k_top))
        state.update(tuple(flat))

        if stopped >= 0:
            level = stopped
        else:
            level = 0
            for k in range(k_top):
                if et[k] is None:
                    break
                level = k + 1
        yield pd.DataFrame({"user_id": [key[0]], "level": [level]})

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=f"user_id {user_type}, level int",
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
