"""windowFunnel strict_order (operators/funnel.py — SURVEY §2.D
sequence family; ClickHouse ``windowFunnel(window, 'strict_order')``).
Fixture users pinned on BOTH sides of every semantic boundary,
including the engine-doc examples the round-9 form diverged on
(ADVICE r9 #1): scan abort at the first non-matching interloper
(``A,B,D,C`` → 2; ``v,s,v,c,p`` → 1), subsequence re-match within the
scanned prefix (``v,c,c,p`` → 3), window-length cutoffs measured from
the inherited chain start, exact boundary ties, and chain-start
resets."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from clickhub_spark.operators.funnel import window_funnel_strict

_T0 = datetime(2024, 1, 10, 12, 0, 0)


def _ev(spark, rows):
    # rows: (user, minutes_after_t0, type)
    data = [
        (u, i, _T0 + timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "user_id string, event_id long, ts timestamp, event_type string"
    )


def _levels(spark, rows, window_s=None):
    ini = F.substring("event_type", 1, 1)
    out = window_funnel_strict(
        _ev(spark, rows),
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
        ts_col="ts",
        window_s=window_s,
    )
    return {r.user_id: r.level for r in out.collect()}


def test_strict_order_scan(spark):
    rows = [
        # u1: v,c,p adjacent -> 3
        ("u1", 0, "view"), ("u1", 1, "click"), ("u1", 2, "purchase"),
        # u2: A,B,D,C from the ClickHouse docs — the non-matching D
        # ABORTS the scan after the chain started -> 2
        ("u2", 0, "view"), ("u2", 1, "click"), ("u2", 2, "signup"),
        ("u2", 3, "purchase"),
        # u3: interloper right after the chain start -> 1
        ("u3", 0, "view"), ("u3", 1, "error"), ("u3", 2, "click"),
        # u4: no view at all -> 0 (later-step events neither start
        # nor abort the scan)
        ("u4", 0, "click"), ("u4", 1, "purchase"),
        # u5: v,s,v,c,p from the ClickHouse docs — the abort is
        # GLOBAL, a later clean chain is never scanned -> 1
        ("u5", 0, "view"), ("u5", 1, "signup"),
        ("u5", 2, "view"), ("u5", 3, "click"), ("u5", 4, "purchase"),
        # u6: v,c,c,p — a repeated condition re-matches its level,
        # the chain is a subsequence within the scanned prefix -> 3
        ("u6", 0, "view"), ("u6", 1, "click"), ("u6", 2, "click"),
        ("u6", 3, "purchase"),
        # u7: v,p,c,p — the premature p (its previous level is
        # unachieved) is an out-of-order event: the engine's
        # strict_order branch aborts and returns the levels-so-far -> 1
        ("u7", 0, "view"), ("u7", 1, "purchase"), ("u7", 2, "click"),
        ("u7", 3, "purchase"),
        # u8: leading interlopers BEFORE any chain start are skipped,
        # not aborting -> 3
        ("u8", 0, "signup"), ("u8", 1, "error"),
        ("u8", 2, "view"), ("u8", 3, "click"), ("u8", 4, "purchase"),
        # u9: second v restarts nothing harmful — v,v,c,p -> 3
        ("u9", 0, "view"), ("u9", 1, "view"), ("u9", 2, "click"),
        ("u9", 3, "purchase"),
    ]
    assert _levels(spark, rows) == {
        "u1": 3, "u2": 2, "u3": 1, "u4": 0, "u5": 1,
        "u6": 3, "u7": 1, "u8": 3, "u9": 3,
    }


def test_window_bound_gates_each_step(spark):
    w = 600  # 10 minutes
    rows = [
        # u1: whole chain inside the window -> 3
        ("u1", 0, "view"), ("u1", 4, "click"), ("u1", 8, "purchase"),
        # u2: click inside, purchase OUTSIDE the window measured from
        # the FIRST event (15 min > 10) -> 2 even though adjacent
        ("u2", 0, "view"), ("u2", 9, "click"), ("u2", 15, "purchase"),
        # u3: click already outside the window -> 1
        ("u3", 0, "view"), ("u3", 11, "click"), ("u3", 12, "purchase"),
        # u4: exact boundary — purchase at EXACTLY window seconds
        # after the view counts (ClickHouse: ts_k - ts_1 <= window)
        ("u4", 0, "view"), ("u4", 5, "click"), ("u4", 10, "purchase"),
        # u5: the out-of-window click never achieves level 2, so the
        # p@25 is an OUT-OF-ORDER event under strict_order — the scan
        # aborts at it and the later tight chain is never seen -> 1
        # (the default-mode twin in test_default_mode_window_resets
        # shows the re-anchoring behavior strict_order forecloses)
        ("u5", 0, "view"), ("u5", 20, "click"), ("u5", 25, "purchase"),
        ("u5", 60, "view"), ("u5", 61, "click"), ("u5", 62, "purchase"),
    ]
    assert _levels(spark, rows, window_s=w) == {
        "u1": 3, "u2": 2, "u3": 1, "u4": 3, "u5": 1
    }


def test_window_start_is_inherited_not_latest(spark):
    """The window for step k is measured from the chain start INHERITED
    through level k-1 (ClickHouse events_timestamp propagation), not
    from the nearest earlier cond1 event."""
    w = 600
    rows = [
        # u1: p is 12 min after the v that anchored its c-chain (out),
        # and the fresher v@10 never got a c after it -> 2
        ("u1", 0, "view"), ("u1", 9, "click"),
        ("u1", 10, "view"), ("u1", 12, "purchase"),
        # u2: same stream plus a second c after the fresh v: the new
        # chain start propagates and p lands inside it -> 3
        ("u2", 0, "view"), ("u2", 9, "click"),
        ("u2", 10, "view"), ("u2", 11, "click"), ("u2", 12, "purchase"),
    ]
    assert _levels(spark, rows, window_s=w) == {"u1": 2, "u2": 3}


def test_unbounded_equals_no_window_argument(spark):
    rows = [
        ("u1", 0, "view"), ("u1", 500, "click"), ("u1", 5000, "purchase"),
    ]
    # no window: arbitrarily slow chains still complete
    assert _levels(spark, rows) == {"u1": 3}
    # tight window gates the same chain to level 1
    assert _levels(spark, rows, window_s=60) == {"u1": 1}


def test_window_requires_ts(spark):
    import pytest

    with pytest.raises(ValueError, match="ts_col"):
        window_funnel_strict(
            _ev(spark, [("u1", 0, "view")]),
            user_col="user_id",
            order=["ts", "event_id"],
            steps=[F.lit(True)],
            window_s=60,
        )


def test_plan_is_window_plus_hash_agg_no_collect_list(spark):
    """The r9 rewrite's point: no per-user collect_list buffer — the
    physical plan is a sort-based Window + hash aggregate."""
    ini = F.substring("event_type", 1, 1)
    out = window_funnel_strict(
        _ev(spark, [("u1", 0, "view")]),
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
        ts_col="ts",
        window_s=600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "collect_list" not in plan


def _levels_mode(spark, rows, modes=(), window_s=None):
    from clickhub_spark.operators.funnel import window_funnel

    ini = F.substring("event_type", 1, 1)
    out = window_funnel(
        _ev(spark, rows),
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
        ts_col="ts",
        window_s=window_s,
        modes=modes,
    )
    return {r.user_id: r.level for r in out.collect()}


def test_default_mode_ignores_interlopers(spark):
    rows = [
        # u1: v,s,c,e,p — non-matching events are simply ignored -> 3
        ("u1", 0, "view"), ("u1", 1, "signup"), ("u1", 2, "click"),
        ("u1", 3, "error"), ("u1", 4, "purchase"),
        # u2: out-of-order chain -> 1 (no c after v... c BEFORE v)
        ("u2", 0, "click"), ("u2", 1, "view"), ("u2", 2, "signup"),
    ]
    assert _levels_mode(spark, rows) == {"u1": 3, "u2": 1}


def test_default_mode_window_resets_at_new_chain_start(spark):
    w = 600  # 10 min
    rows = [
        # slow first chain (c at 20 min > w), fresh v@60 restarts the
        # clock and the tight chain completes — interlopers present,
        # which strict_order would abort on but default ignores
        ("u1", 0, "view"), ("u1", 1, "signup"), ("u1", 20, "click"),
        ("u1", 60, "view"), ("u1", 61, "click"), ("u1", 62, "purchase"),
    ]
    assert _levels_mode(spark, rows, window_s=w) == {"u1": 3}
    # strict_order on the same stream aborts at the signup -> 1
    assert _levels_mode(spark, rows, modes=("strict_order",), window_s=w) == {
        "u1": 1
    }


def test_strict_dedup_stops_at_repeated_level(spark):
    rows = [
        # u1: A->B->B->C from the docs — the second B stops the scan,
        # level = the duplicate's own level -> 2
        ("u1", 0, "view"), ("u1", 1, "click"), ("u1", 2, "click"),
        ("u1", 3, "purchase"),
        # u2: no duplicates -> full chain 3
        ("u2", 0, "view"), ("u2", 1, "click"), ("u2", 2, "purchase"),
        # u3: repeated cond1 is EXEMPT (resets the chain start) -> 3
        ("u3", 0, "view"), ("u3", 1, "view"), ("u3", 2, "click"),
        ("u3", 3, "purchase"),
        # u4: a COMPLETED funnel returns immediately (the engine's
        # events_size early return), so the duplicate c AFTER the
        # purchase is never scanned -> 3
        ("u4", 0, "view"), ("u4", 1, "click"), ("u4", 2, "purchase"),
        ("u4", 3, "click"),
        # u5: dup BEFORE completion still stops — the second c
        # precedes the p, scan returns 2 and never sees the p
        ("u5", 0, "view"), ("u5", 1, "click"), ("u5", 2, "click"),
        ("u5", 3, "purchase"), ("u5", 4, "purchase"),
    ]
    assert _levels_mode(spark, rows, modes=("strict_dedup",)) == {
        "u1": 2, "u2": 3, "u3": 3, "u4": 3, "u5": 2
    }


def test_strict_increase_requires_strictly_later_ts(spark):
    # u1: c shares v's timestamp -> tie does not advance -> 1
    # u2: strictly increasing -> 3
    # u3: p ties with c -> 2
    rows1 = [
        ("u1", 0, "view"), ("u1", 0, "click"), ("u1", 1, "purchase"),
        ("u2", 0, "view"), ("u2", 1, "click"), ("u2", 2, "purchase"),
        ("u3", 0, "view"), ("u3", 1, "click"), ("u3", 1, "purchase"),
    ]
    assert _levels_mode(spark, rows1, modes=("strict_increase",)) == {
        "u1": 1, "u2": 3, "u3": 2
    }
    # without the mode, ties advance (window test is <=)
    assert _levels_mode(spark, rows1, window_s=600) == {
        "u1": 3, "u2": 3, "u3": 3
    }


def test_modes_compose_order_plus_increase(spark):
    rows = [
        # interloper aborts (strict_order) before the tight chain
        ("u1", 0, "view"), ("u1", 1, "error"),
        ("u1", 2, "view"), ("u1", 2, "click"),
        # clean stream but c ties v: increase blocks level 2
        ("u2", 0, "view"), ("u2", 0, "click"), ("u2", 1, "purchase"),
        # clean and strictly increasing
        ("u3", 0, "view"), ("u3", 1, "click"), ("u3", 2, "purchase"),
    ]
    got = _levels_mode(
        spark, rows, modes=("strict_order", "strict_increase")
    )
    assert got == {"u1": 1, "u2": 1, "u3": 3}


def test_unknown_mode_rejected(spark):
    import pytest

    from clickhub_spark.operators.funnel import window_funnel

    with pytest.raises(ValueError, match="unknown windowFunnel mode"):
        window_funnel(
            _ev(spark, [("u1", 0, "view")]),
            user_col="user_id",
            order=["ts", "event_id"],
            steps=[F.lit(True)],
            modes=("strict",),
        )


def test_dedup_composes_with_window(spark):
    """strict_dedup's 'already achieved' state respects the window
    gating: an out-of-window c does NOT achieve level 2, so a later c
    is not a duplicate — it's the first real achievement."""
    w = 600  # 10 min
    rows = [
        # c@20min is outside the window (no level-2), second c@62 min
        # rides the fresh v@60 chain — NOT a dup -> 3
        ("u1", 0, "view"), ("u1", 20, "click"),
        ("u1", 60, "view"), ("u1", 61, "click"), ("u1", 62, "purchase"),
        # both c's in-window: the second IS a dup, scan stops at 2
        ("u2", 0, "view"), ("u2", 1, "click"), ("u2", 2, "click"),
        ("u2", 3, "purchase"),
    ]
    got = _levels_mode(spark, rows, modes=("strict_dedup",), window_s=w)
    assert got == {"u1": 3, "u2": 2}
