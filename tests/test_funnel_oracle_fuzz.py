"""Fuzz the five registered funnel ORACLES (pure DuckDB, no Spark)
against the sequential engine-scan reference transcription.

The parity gate proves Spark ≡ oracle on the testdata; the
differential test proves Spark ≡ engine scan on random streams.  This
closes the triangle's third side directly: oracle ≡ engine scan on
random streams — including timestamp ties, window-boundary straddles,
leading interlopers, duplicate bursts, and out-of-order steps that the
synthetic testdata may never produce.  Histograms (level → users) are
compared per seed; with 200 users per seed and 3 seeds a per-user
divergence is overwhelmingly likely to shift a histogram bucket.

The oracle SQL is taken from the registry specs VERBATIM — the fuzz
covers exactly what the driver runs.
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pytest

from clickhub_spark.plans import all_specs
from tests.test_funnel_differential import _reference_level

_W = 86_400  # the registered queries' window
_TYPES = ["view", "click", "purchase", "signup", "error"]
#: gap choices straddle the one-day window and include exact ties
_GAPS = [0, 0, 1, 7, 3_600, 50_000, 86_400, 90_000]

_QUERIES = {
    # name -> (modes, window_s) for the reference scan
    "q_funnel_strict": (("strict_order",), None),
    "q_funnel_strict_window": (("strict_order",), _W),
    "q_funnel_window": ((), _W),
    "q_funnel_strict_dedup": (("strict_dedup",), None),
    "q_funnel_strict_increase": (("strict_increase",), _W),
}


def _streams(seed: int, n_users: int = 200):
    rng = random.Random(seed)
    t0 = datetime.datetime(2024, 1, 5)
    rows, per_user = [], {}
    eid = 0
    for uid in range(n_users):
        user = f"u{uid:04d}"
        length = rng.randint(0, 10)
        ts = 0.0
        evts = []
        for _ in range(length):
            ts += rng.choice(_GAPS)
            etype = rng.choice(_TYPES)
            evts.append((ts, etype[0]))
            rows.append(
                (eid, t0 + datetime.timedelta(seconds=ts), user, etype)
            )
            eid += 1
        per_user[user] = evts
    return rows, per_user


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_matches_engine_scan(name):
    modes, window_s = _QUERIES[name]
    oracle = all_specs()[name].oracle
    for seed in (11, 29, 47):
        rows, per_user = _streams(seed)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events "
            "(event_id BIGINT, ts TIMESTAMP, user_id VARCHAR, "
            "event_type VARCHAR)"
        )
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
        got = {
            int(level): int(n) for level, n in con.sql(oracle).fetchall()
        }
        want: dict[int, int] = {}
        for evts in per_user.values():
            if not evts:
                continue  # users with no events don't appear
            lvl = _reference_level(evts, window_s, modes)
            want[lvl] = want.get(lvl, 0) + 1
        assert got == want, (
            f"{name} seed={seed}: oracle {got} != engine scan {want}"
        )
