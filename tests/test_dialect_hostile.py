"""Round-12 review repros, pinned: the q_ch_sql_* dialect queries and
their oracles must agree on HOSTILE data shapes that the driver
testdata happens not to contain — an unmatched sequence user (empty
trail under ANSI), a user with zero step-matching entries, and a NULL
event_type row inside a strict_order funnel.  Each case replicates
the driver's compare (Spark builder vs DuckDB oracle over the same
parquet) on synthetic events."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from clickhub_spark.plans.registry import all_specs

_T0 = datetime.datetime(2024, 1, 1)


def _ts(s: float) -> datetime.datetime:
    return _T0 + datetime.timedelta(seconds=s)


@pytest.fixture(scope="module")
def hostile_dir(spark, tmp_path_factory):
    """Synthetic events: user 1 completes the view→click→purchase
    chain; user 2 has view+click but NO purchase (empty seq-events
    trail — the ANSI element_at crash case); user 3's events match NO
    funnel/sequence condition (entry-less user — the dropped-level-0
    oracle case); user 4 has a NULL event_type between view and click
    (the strict_order intervening-event oracle blindness).  All
    values >= 60 so the value<40 / value<8-family conditions stay
    inert and the shapes above are exactly as stated."""
    rows = [
        (1, _ts(10), 1, "view", 90.0, None),
        (2, _ts(20), 1, "click", 90.0, None),
        (3, _ts(30), 1, "purchase", 90.0, None),
        (4, _ts(10), 2, "view", 90.0, None),
        (5, _ts(20), 2, "click", 90.0, None),
        (6, _ts(10), 3, "error", 90.0, None),
        (7, _ts(20), 3, "signup", 90.0, None),
        (8, _ts(10), 4, "view", 90.0, None),
        (9, _ts(20), 4, None, 90.0, None),
        (10, _ts(30), 4, "click", 90.0, None),
        (11, _ts(40), 4, "purchase", 90.0, None),
    ]
    d = tmp_path_factory.mktemp("hostile")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def _compare(spark, hostile_dir, name):
    spec = all_specs()[name]
    # collect() keeps SQL NULLs as None (toPandas would NaN-ify
    # nullable doubles and break the oracle comparison)
    got = [tuple(r) for r in spec.builder(spark, hostile_dir).collect()]
    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{hostile_dir}/events.parquet/*.parquet'"
    )
    want = [tuple(r) for r in con.sql(spec.oracle).fetchall()]
    assert sorted(map(repr, got)) == sorted(map(repr, want)), (
        f"{name}: spark={sorted(got)} oracle={sorted(want)}"
    )
    return got


def test_seq_events_unmatched_user(spark, hostile_dir):
    """User 2's trail is EMPTY — try_element_at must yield NULLs, not
    an ANSI INVALID_ARRAY_INDEX error, and both sides must emit the
    unmatched row."""
    got = _compare(spark, hostile_dir, "q_ch_sql_seq_events")
    by_user = {r[0]: r for r in got}
    assert by_user[1][1] is True  # matched
    assert by_user[2][1] is False and by_user[2][2] is None
    assert by_user[3][1] is False  # entry-less user still emitted


def test_funnel_multimatch_entryless_user(spark, hostile_dir):
    """User 3 matches no step condition: the dialect GROUP BY emits
    it at level 0 and the oracle's full-user LEFT JOIN must too (all
    values >= 60, so NO step condition fires for anyone and every
    user lands at level 0)."""
    got = _compare(spark, hostile_dir, "q_ch_sql_funnel_multimatch")
    assert dict(got) == {0: 4}


def test_funnel_strict_null_event_type(spark, hostile_dir):
    """User 4's NULL event_type row is an INTERVENING event: the scan
    aborts at it (level 1), and the oracle's COALESCE(i NOT IN …,
    TRUE) must register the break exactly like the shim's -1
    sentinel."""
    got = _compare(spark, hostile_dir, "q_ch_sql_funnel_strict")
    levels = dict(got)
    # users 1: v,c,p → 3; user 2: v,c → 2; user 3: no view → 0;
    # user 4: v,NULL,… → aborted at level 1
    assert levels == {3: 1, 2: 1, 0: 1, 1: 1}
