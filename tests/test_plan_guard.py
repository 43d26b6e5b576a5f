"""Plan-fingerprint guard unit: the comparator flags exactly the
regression classes we care about, tolerates new queries, and the
committed snapshot stays loadable and non-trivial."""

import json

from tools.plan_guard import (
    COMPLEX_OUTPUT_OK,
    SNAPSHOT,
    UNPARTITIONED_WINDOW_CANON,
    WORSE_IF_MORE,
    compare,
    complex_output_count,
    fingerprint,
)


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
        "UnpartitionedWindow",
        "ComplexOutput",
    }
    # every unpartitioned window in the snapshot is on the documented
    # canon list, and the list carries no stale names
    offenders = {n for n, fp in snap.items() if fp.get("UnpartitionedWindow")}
    assert offenders <= UNPARTITIONED_WINDOW_CANON
    assert UNPARTITIONED_WINDOW_CANON <= set(snap)
    # no registered query may emit Array/Map/Struct output columns —
    # the driver canon crashes on array cells (round-6 driver-red)
    complex_offenders = {n for n, fp in snap.items() if fp.get("ComplexOutput")}
    assert complex_offenders <= COMPLEX_OUTPUT_OK


def test_fingerprint_detects_unpartitioned_window_specs():
    """The spec regex separates ordered-unpartitioned (flagged) from
    partitioned (fine) windowspecdefinitions, counting specs."""
    unpart = (
        "(1) Window\nArguments: [sum(d1#9L) windowspecdefinition("
        "value#4 ASC NULLS FIRST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), currentrow$())) AS c1#20L]\n"
    )
    part = (
        "(1) Window\nArguments: [sum(g1#113) windowspecdefinition("
        "seg#112L, value#108 ASC NULLS FIRST, specifiedwindowframe("
        "RangeFrame, unboundedpreceding$(), currentrow$())) AS c1#1L]\n"
    )
    part_noorder = (
        "(1) Window\nArguments: [sum(g1#113) windowspecdefinition("
        "seg#112L, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS n1#2L]\n"
    )
    assert fingerprint(unpart).get("UnpartitionedWindow") == 1
    assert "UnpartitionedWindow" not in fingerprint(part)
    assert "UnpartitionedWindow" not in fingerprint(part_noorder)


def test_compare_enforces_unpartitioned_window_canon():
    """Seeded regressions: a canon query growing another global-window
    spec is flagged; ANY non-canon query with one is flagged even when
    its own snapshot already carried it (hard floor, not just delta)."""
    old = {"q_llm_pack": {"UnpartitionedWindow": 1}, "q_rogue": {"UnpartitionedWindow": 1}}
    new = {"q_llm_pack": {"UnpartitionedWindow": 2}, "q_rogue": {"UnpartitionedWindow": 1}}
    problems = compare(old, new)
    assert any("q_llm_pack" in p and "unpartitioned" in p.lower() for p in problems)
    assert any("q_rogue" in p and "UNPARTITIONED_WINDOW_CANON" in p for p in problems)
    # and the clean state is quiet
    clean = {"q_llm_pack": {"UnpartitionedWindow": 1}}
    assert compare({"q_llm_pack": {"UnpartitionedWindow": 1}}, clean) == []


def test_fingerprint_catches_multiword_first_order_key():
    """ADVICE r6: the old `\\S+` regex missed unpartitioned windows
    whose first ordering expression contains spaces (CAST(...) keys,
    multi-key orders) — the paren-aware scan must flag them."""
    cast_key = (
        "(1) Window\nArguments: [sum(d#9L) windowspecdefinition("
        "cast(value#4 as bigint) ASC NULLS FIRST, specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), currentrow$())) AS c#20L]\n"
    )
    assert fingerprint(cast_key).get("UnpartitionedWindow") == 1
    # partitioned window with a CAST partition expr must stay quiet
    part_cast = (
        "(1) Window\nArguments: [sum(d#9L) windowspecdefinition("
        "cast(seg#3 as bigint), value#4 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS c#20L]\n"
    )
    assert "UnpartitionedWindow" not in fingerprint(part_cast)


def test_complex_output_count_and_hard_floor():
    """Seeded offender: a query whose schema carries a top-level
    array/map/struct column is a hard --check failure regardless of
    snapshot state (the driver canon crashes on array cells)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("arr", ArrayType(IntegerType())),
            StructField("m", MapType(StringType(), IntegerType())),
            StructField(
                "s", StructType([StructField("x", IntegerType())])
            ),
            StructField("name", StringType()),
        ]
    )
    assert complex_output_count(schema) == 3
    scalar = StructType([StructField("id", IntegerType())])
    assert complex_output_count(scalar) == 0

    old = {"q_seeded": {"ComplexOutput": 1}}
    new = {"q_seeded": {"ComplexOutput": 1}}
    problems = compare(old, new)  # hard floor: old snapshot is no excuse
    assert any("q_seeded" in p and "Array/Map/Struct" in p for p in problems)
    assert compare({}, {"q_ok": {"Exchange": 1}}) == []


def test_fingerprint_catches_orderless_unpartitioned_window():
    """Review r7: Window.partitionBy() with no orderBy plans a
    windowspecdefinition whose FIRST argument is the frame spec —
    same Exchange SinglePartition, must be counted."""
    orderless = (
        "(1) Window\nArguments: [sum(x#1L) windowspecdefinition("
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS t#9L]\n"
    )
    assert fingerprint(orderless).get("UnpartitionedWindow") == 1
    # partitioned order-less window stays quiet
    part_orderless = (
        "(1) Window\nArguments: [sum(x#1L) windowspecdefinition(seg#3, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS t#9L]\n"
    )
    assert "UnpartitionedWindow" not in fingerprint(part_orderless)
