"""Plan-fingerprint guard unit: the comparator flags exactly the
regression classes we care about, tolerates new queries, and the
committed snapshot stays loadable and non-trivial."""

import json

from tools.plan_guard import SNAPSHOT, WORSE_IF_MORE, compare, fingerprint


def test_fingerprint_counts_detail_headers():
    plan = (
        "== Physical Plan ==\nAdaptiveSparkPlan (9)\n"
        "(1) Scan parquet spark_catalog.x\n"
        "(2) Exchange\n(3) Exchange\n"
        "(4) BroadcastExchange\n"
        "(5) SortMergeJoin Inner\n"
        "(6) Window\n(7) HashAggregate\n"
        "(8) ArrowEvalPython\n(9) CartesianProduct\n"
    )
    fp = fingerprint(plan)
    assert fp["Exchange"] == 2
    assert fp["BroadcastExchange"] == 1
    assert fp["SortMergeJoin"] == 1
    assert fp["CartesianProduct"] == 1
    assert fp["Scan parquet"] == 1
    assert "Window" in fp and "ArrowEvalPython" in fp


def test_compare_flags_only_regressions():
    old = {"q_a": {"Exchange": 1}, "q_b": {"Exchange": 2, "BroadcastHashJoin": 1}}
    good = {"q_a": {"Exchange": 1}, "q_b": {"Exchange": 1, "BroadcastHashJoin": 1}}
    assert compare(old, good) == []  # fewer shuffles is fine
    bad = {
        "q_a": {"Exchange": 2},
        "q_b": {"Exchange": 2, "SortMergeJoin": 1},
        "q_new": {"Exchange": 9},  # no baseline -> tolerated
    }
    problems = compare(old, bad)
    assert len(problems) == 2
    assert any("q_a" in p and "extra shuffle" in p for p in problems)
    assert any("q_b" in p and "sort-merge" in p for p in problems)


def test_compare_flags_new_plan_errors():
    old = {"q_a": {"Exchange": 1}}
    bad = {"q_a": {"__error__": 1, "__msg__": "boom"}}
    assert any("fails to plan" in p for p in compare(old, bad))


def test_snapshot_committed_and_sane():
    with open(SNAPSHOT) as f:
        snap = json.load(f)
    assert len(snap) >= 200
    # red-flag operators must be absent from the committed baseline
    # (modulo the documented broadcast-scalar crossJoins, which plan
    # as BroadcastNestedLoopJoin with a 1-row side)
    assert not any(fp.get("CartesianProduct") for fp in snap.values())
    assert not any(fp.get("BatchEvalPython") for fp in snap.values())
    assert not any("__error__" in fp for fp in snap.values())
    assert set(WORSE_IF_MORE) <= {
        "Exchange",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "SortMergeJoin",
        "BatchEvalPython",
    }
