"""General sequenceMatch/sequenceCount operator (operators/seqmatch):
the JVM regex path and the applyInPandas automaton path must both
agree with the INDEPENDENT engine-automaton transcription in
tests/test_sequence_differential.py, across random streams with
OVERLAPPING conditions, for match, count, adjacency, wildcard, and
time-constrained patterns."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from clickhub_spark.operators.seqmatch import (
    parse_pattern,
    sequence_count,
    sequence_match,
)
from tests.test_sequence_differential import (
    _ch_seq_match as _ch_sequence_match,
    _ch_seq_match_from as _ch_sequence_match_from,
)

# overlapping alphabet: 'b' hits conds 1+2, 'z' hits all three
_CONDS = [
    {"v", "b", "z"},
    {"c", "b", "z"},
    {"p", "z"},
]


def _streams(n, seed):
    rng = random.Random(seed)
    out = {}
    for uid in range(n):
        ts = 0
        evts = []
        for _ in range(rng.randint(1, 12)):
            ts += rng.choice([0, 0, 600, 1800, 3600, 7200])
            evts.append((ts, rng.choice("vvccppbbzzxy")))
        out[uid] = evts
    return out


def _df(spark, streams):
    rows = [
        (uid, uid * 1000 + i, float(ts), letter)
        for uid, evts in streams.items()
        for i, (ts, letter) in enumerate(evts)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts double, event_type string"
    )


def _ref_count(evts, conds, pattern_tokens):
    entries = [
        (ts, m)
        for ts, letter in evts
        for m in [frozenset(k for k, c in enumerate(conds) if letter in c)]
        if m
    ]
    n, pos = 0, 0
    while True:
        r = _ch_sequence_match_from(entries, pattern_tokens, pos)
        if r is None:
            break
        n += 1
        pos = max(r, pos + 1)
    return n


def test_parse_pattern():
    assert parse_pattern("(?1).*(?2)") == [
        ("cond", 0),
        ("star",),
        ("cond", 1),
    ]
    assert parse_pattern("(?1)(?t<=3600)(?2).") == [
        ("cond", 0),
        ("time", "<=", 3600.0),
        ("cond", 1),
        ("any",),
    ]
    with pytest.raises(ValueError):
        parse_pattern("(?1)(?t<5)")  # dangling time condition
    with pytest.raises(ValueError):
        parse_pattern("(?x)")
    # The engine's parser requires (?t…) to DIRECTLY follow an event
    # atom: a preceding '.*' is a parse error there, and silently
    # dropping (leading case: last_ts would be None) or reinterpreting
    # the constraint across the star would be a semantics divergence
    # (ADVICE r11).
    with pytest.raises(ValueError, match="directly between"):
        parse_pattern(".*(?t>5)(?2)")
    with pytest.raises(ValueError, match="directly between"):
        parse_pattern("(?1).*(?t>5)(?2)")
    with pytest.raises(ValueError, match="directly between"):
        parse_pattern("(?1)(?t>5).*(?2)")
    # '.' IS an event atom — time next to it stays legal.
    assert parse_pattern(".(?t<5)(?1)") == [
        ("any",),
        ("time", "<", 5.0),
        ("cond", 0),
    ]


def test_seqmatch_regex_path_vs_automaton(spark):
    streams = _streams(120, seed=31)
    df = _df(spark, streams)
    conds = [F.col("event_type").isin(*sorted(s)) for s in _CONDS]
    cases = {
        "(?1).*(?2).*(?3)": [
            ("cond", 0), ("star",), ("cond", 1), ("star",), ("cond", 2),
        ],
        "(?1)(?2)": [("cond", 0), ("cond", 1)],
        "(?1).(?3)": [("cond", 0), ("any",), ("cond", 2)],
        "(?3).*(?1)": [("cond", 2), ("star",), ("cond", 0)],
    }
    for pattern, tokens in cases.items():
        got = {
            r.user_id: r.matched
            for r in sequence_match(
                df, "user_id", ["ts", "event_id"], conds, pattern
            ).collect()
        }
        n_true = 0
        for uid, evts in streams.items():
            want = _ch_sequence_match(evts, _CONDS, tokens)
            n_true += want
            # users with NO entries produce no row: matched = False
            assert got.get(uid, False) == want, (
                f"{pattern} uid={uid}: stream={evts}"
            )
        assert 0 < n_true  # the fuzz exercises true outcomes


def test_seqcount_regex_path_vs_automaton(spark):
    streams = _streams(120, seed=32)
    df = _df(spark, streams)
    conds = [F.col("event_type").isin(*sorted(s)) for s in _CONDS]
    for pattern, tokens in {
        "(?1).*(?3)": [("cond", 0), ("star",), ("cond", 2)],
        "(?2)(?3)": [("cond", 1), ("cond", 2)],
    }.items():
        got = {
            r.user_id: r.n_matches
            for r in sequence_count(
                df, "user_id", ["ts", "event_id"], conds, pattern
            ).collect()
        }
        assert max(got.values()) >= 2  # multi-match streams exist
        for uid, evts in streams.items():
            want = _ref_count(evts, _CONDS, tokens)
            assert got.get(uid, 0) == want, (
                f"{pattern} uid={uid}: stream={evts}"
            )


def test_seqmatch_time_path_vs_automaton(spark):
    streams = _streams(120, seed=33)
    df = _df(spark, streams)
    conds = [F.col("event_type").isin(*sorted(s)) for s in _CONDS]
    pattern = "(?1)(?t<3600)(?2)"
    tokens = [("cond", 0), ("time", "<", 3600.0), ("cond", 1)]
    got = {
        r.user_id: r.matched
        for r in sequence_match(
            df,
            "user_id",
            ["ts", "event_id"],
            conds,
            pattern,
            ts_col="ts",
        ).collect()
    }
    n_true = 0
    for uid, evts in streams.items():
        want = _ch_sequence_match(evts, _CONDS, tokens)
        n_true += want
        assert got.get(uid, False) == want, f"uid={uid}: stream={evts}"
    assert 0 < n_true
    # time pattern without ts_col is a contract error
    with pytest.raises(ValueError, match="ts_col"):
        sequence_match(df, "user_id", ["ts", "event_id"], conds, pattern)


def test_seqcount_time_path(spark):
    streams = _streams(120, seed=34)
    df = _df(spark, streams)
    conds = [F.col("event_type").isin(*sorted(s)) for s in _CONDS]
    tokens = [("cond", 0), ("time", ">=", 3600.0), ("cond", 2)]
    got = {
        r.user_id: r.n_matches
        for r in sequence_count(
            df,
            "user_id",
            ["ts", "event_id"],
            conds,
            "(?1)(?t>=3600)(?3)",
            ts_col="ts",
        ).collect()
    }
    for uid, evts in streams.items():
        want = _ref_count(evts, _CONDS, tokens)
        assert got.get(uid, 0) == want, f"uid={uid}: stream={evts}"
