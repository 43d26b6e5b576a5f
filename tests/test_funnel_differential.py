"""Differential test: window_funnel vs a direct sequential
transcription of the engine's scan algorithm (the getEventLevel loop —
per-event else-if chain over sorted events with K optional
(chain_start, achieved_at) slots), across random streams × all eight
mode combinations × {unbounded, windowed}.

This is the strongest pin available for engine parity: the registered
queries' DuckDB oracles TRANSCRIBE the window-SQL construction, so
the parity gate is structurally blind to a semantics error made in
both places (the ADVICE r9 #1 / round-10 review class).  The
reference here is written from the engine's documented scan rules,
not from the window construction, so the two can only agree if the
running-max collapse is actually equivalent to the sequential DP.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from clickhub_spark.operators.funnel import window_funnel

_CONDS = ["v", "c", "p"]  # step letters; x/y match nothing


def _reference_level_entries(entries, window_s, modes, k_top):
    """Sequential transcription of the engine scan (module docstring)
    over its ENTRY list: ``entries`` = [(ts, step_idx)] in scan order,
    step_idx = -1 for an event matching no condition.  The engine's
    aggregate stores exactly this list (one entry per condition an
    event matches, condition-index order within an event)."""
    strict_order = "strict_order" in modes
    dedup = "strict_dedup" in modes
    inc = "strict_increase" in modes
    et: list[tuple[float, float] | None] = [None] * k_top
    first_event = False
    for ts, idx in entries:
        if idx == -1:
            if strict_order and first_event:
                break  # intervening non-matching event aborts
            continue
        if idx == 0:
            et[0] = (ts, ts)  # chain start resets
            first_event = True
        elif dedup and et[idx] is not None:
            return idx + 1  # duplicate of an achieved level: its level
        elif strict_order and first_event and et[idx - 1] is None:
            # out-of-order step event: return levels-so-far count
            for lvl in range(k_top):
                if et[lvl] is None:
                    return lvl
            return k_top
        elif et[idx - 1] is not None:
            first_ts, last_ts = et[idx - 1]
            ok = window_s is None or ts <= first_ts + window_s
            if ok and inc:
                ok = last_ts < ts
            if ok:
                et[idx] = (first_ts, ts)
                if idx + 1 == k_top:
                    return k_top  # completion early return
    for lvl in range(k_top, 0, -1):
        if et[lvl - 1] is not None:
            return lvl
    return 0


def _reference_level(evts, window_s, modes):
    """Mutually exclusive conditions: one letter, at most one entry."""
    entries = [
        (ts, _CONDS.index(letter) if letter in _CONDS else -1)
        for ts, letter in evts
    ]
    return _reference_level_entries(entries, window_s, modes, len(_CONDS))


def _random_streams(n, seed):
    rng = random.Random(seed)
    streams = {}
    for uid in range(n):
        length = rng.randint(0, 12)
        ts = 0.0
        evts = []
        for _ in range(length):
            ts += rng.choice([0.0, 0.0, 1.0, 1.0, 5.0])  # ties common
            evts.append((ts, rng.choice("vvccppxy")))
        streams[f"u{uid}"] = evts
    return streams


_MODE_COMBOS = [
    (),
    ("strict_order",),
    ("strict_dedup",),
    ("strict_increase",),
    ("strict_order", "strict_dedup"),
    ("strict_order", "strict_increase"),
    ("strict_dedup", "strict_increase"),
    ("strict_order", "strict_dedup", "strict_increase"),
]


def test_differential_vs_engine_scan(spark):
    streams = _random_streams(150, seed=1021)
    rows = [
        (uid, i, float(ts), letter)
        for uid, evts in streams.items()
        for i, (ts, letter) in enumerate(evts)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts double, event_type string"
    )
    lt = F.col("event_type")
    steps = [lt == c for c in _CONDS]
    for window_s in (None, 3.0):
        for modes in _MODE_COMBOS:
            got = {
                r.user_id: r.level
                for r in window_funnel(
                    df,
                    user_col="user_id",
                    order=["ts", "event_id"],
                    steps=steps,
                    ts_col="ts",
                    window_s=window_s,
                    modes=modes,
                ).collect()
            }
            for uid, evts in streams.items():
                want = _reference_level(evts, window_s, modes)
                have = got.get(uid, 0) if evts else got.get(uid)
                if not evts:
                    continue  # empty streams produce no rows
                assert have == want, (
                    f"uid={uid} modes={modes} window={window_s}: "
                    f"got {have}, engine scan says {want}; "
                    f"stream={evts}"
                )


# overlapping conditions: 'b' matches steps 0 AND 1, 'q' matches
# steps 1 AND 2, 'z' matches ALL three — the engine inserts one entry
# per matched condition and one event can climb several levels
_MULTI_CONDS = [
    {"v", "b", "z"},
    {"c", "b", "q", "z"},
    {"p", "q", "z"},
]


def test_differential_multi_match(spark):
    """VERDICT r10 #5: with multi_match=True, overlapping step
    conditions must reproduce the engine's entry-list scan (one event
    advancing multiple pending chains) across every mode combo."""
    rng = random.Random(2027)
    streams = {}
    for uid in range(150):
        length = rng.randint(0, 12)
        ts = 0.0
        evts = []
        for _ in range(length):
            ts += rng.choice([0.0, 0.0, 1.0, 1.0, 5.0])
            evts.append((ts, rng.choice("vvccppbbqqzxy")))
        streams[f"u{uid}"] = evts
    rows = [
        (uid, i, float(ts), letter)
        for uid, evts in streams.items()
        for i, (ts, letter) in enumerate(evts)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts double, event_type string"
    )
    steps = [F.col("event_type").isin(*sorted(s)) for s in _MULTI_CONDS]
    k_top = len(_MULTI_CONDS)
    for window_s in (None, 3.0):
        for modes in _MODE_COMBOS:
            got = {
                r.user_id: r.level
                for r in window_funnel(
                    df,
                    user_col="user_id",
                    order=["ts", "event_id"],
                    steps=steps,
                    ts_col="ts",
                    window_s=window_s,
                    modes=modes,
                    multi_match=True,
                ).collect()
            }
            for uid, evts in streams.items():
                if not evts:
                    continue
                entries = []
                for ts, letter in evts:
                    idxs = [
                        k
                        for k, cond in enumerate(_MULTI_CONDS)
                        if letter in cond
                    ]
                    entries.extend(
                        (ts, k) for k in (idxs if idxs else [-1])
                    )
                want = _reference_level_entries(
                    entries, window_s, modes, k_top
                )
                have = got.get(uid, 0)
                assert have == want, (
                    f"uid={uid} modes={modes} window={window_s}: "
                    f"got {have}, engine scan says {want}; "
                    f"stream={evts}"
                )


def test_check_exclusive_guard(spark):
    """check_exclusive=True turns the single-match precondition into a
    raised error (ADVICE r10 #2) instead of a silent divergence; and
    exclusive conditions pass the guard unchanged."""
    import pytest

    df = spark.createDataFrame(
        [("u1", 0, 1.0, "b")],
        "user_id string, event_id long, ts double, event_type string",
    )
    overlapping = [
        F.col("event_type").isin("v", "b"),
        F.col("event_type").isin("c", "b"),
    ]
    with pytest.raises(ValueError, match="multi_match"):
        window_funnel(
            df,
            user_col="user_id",
            order=["ts", "event_id"],
            steps=overlapping,
            check_exclusive=True,
        )
    exclusive = [F.col("event_type") == "v", F.col("event_type") == "b"]
    out = window_funnel(
        df,
        user_col="user_id",
        order=["ts", "event_id"],
        steps=exclusive,
        check_exclusive=True,
    )
    # guard passes; the lone 'b' (step 2, step 1 unachieved) → level 0
    assert [(r.user_id, r.level) for r in out.collect()] == [("u1", 0)]

