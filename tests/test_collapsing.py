"""CollapsingMergeTree / VersionedCollapsingMergeTree FINAL semantics
(SURVEY §2.E — siblings of ReplacingMergeTree, reference
README.md:132-134 DDL family), on hand-built sign-changelog fixtures.

The driver-checked queries (q_dedup_collapsing*) exercise the happy
paths at data scale; these units pin the contract's edges: the
net-negative first-cancel rule, full cancellation, per-version pairing
under out-of-order delivery, and dangling cancels.
"""

from pyspark.sql import functions as F

from clickhub_spark.operators.collapsing import (
    collapse_final,
    collapse_final_versioned,
)

_SCHEMA = "k string, seq int, payload string, sign int"


def _log(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_collapse_net_positive_keeps_last_state(spark):
    out = collapse_final(
        _log(
            spark,
            [
                ("a", 1, "v1", 1),
                ("a", 1, "v1", -1),  # cancels v1
                ("a", 2, "v2", 1),
            ],
        ),
        keys=["k"],
        sign="sign",
        order=["seq"],
    )
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0].k, rows[0].payload, rows[0].sign) == ("a", "v2", 1)


def test_collapse_net_zero_vanishes(spark):
    out = collapse_final(
        _log(spark, [("a", 1, "v1", 1), ("a", 2, "v1", -1)]),
        keys=["k"],
        sign="sign",
        order=["seq"],
    )
    assert out.count() == 0


def test_collapse_net_negative_surfaces_first_cancel(spark):
    # ClickHouse keeps a cancel row when the changelog ends
    # sign-negative; ours keeps the FIRST cancel by the explicit order
    out = collapse_final(
        _log(
            spark,
            [
                ("a", 1, "v1", 1),
                ("a", 2, "v1", -1),
                ("a", 3, "v0", -1),  # dangling extra cancel
            ],
        ),
        keys=["k"],
        sign="sign",
        order=["seq"],
    )
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0].payload, rows[0].sign, rows[0].seq) == ("v1", -1, 2)


def test_collapse_keys_are_independent(spark):
    out = collapse_final(
        _log(
            spark,
            [
                ("a", 1, "v1", 1),
                ("a", 2, "v1", -1),
                ("b", 1, "w1", 1),
            ],
        ),
        keys=["k"],
        sign="sign",
        order=["seq"],
    )
    rows = out.collect()
    assert [(r.k, r.payload) for r in rows] == [("b", "w1")]


_VSCHEMA = "k string, ver long, seq int, payload string, sign int"


def test_versioned_cancel_targets_its_version_out_of_order(spark):
    # cancel for ver=2 arrives BEFORE its state row (seq order) — the
    # variant's whole point: pairing is by version, not sequence
    rows = [
        ("a", 2, 1, "v2", -1),
        ("a", 1, 2, "v1", 1),
        ("a", 2, 3, "v2", 1),
        ("a", 3, 4, "v3", 1),
        ("a", 3, 5, "v3", -1),
    ]
    out = collapse_final_versioned(
        spark.createDataFrame(rows, _VSCHEMA),
        keys=["k"],
        sign="sign",
        version="ver",
        order=["seq"],
    ).collect()
    # ver 2 and ver 3 cancelled; max surviving version is 1
    assert len(out) == 1
    assert (out[0].ver, out[0].payload) == (1, "v1")


def test_versioned_dangling_cancel_vanishes(spark):
    # a cancel whose state never arrived must not surface a row
    rows = [
        ("a", 5, 1, "v5", -1),
        ("a", 1, 2, "v1", 1),
    ]
    out = collapse_final_versioned(
        spark.createDataFrame(rows, _VSCHEMA),
        keys=["k"],
        sign="sign",
        version="ver",
        order=["seq"],
    ).collect()
    assert [(r.ver, r.payload) for r in out] == [(1, "v1")]


def test_versioned_duplicate_state_last_by_order_wins(spark):
    # two +1 writes of the same version (at-least-once producer):
    # net > 0, the later write by the explicit order is the survivor
    rows = [
        ("a", 1, 1, "old", 1),
        ("a", 1, 2, "new", 1),
        ("a", 1, 3, "old", -1),
    ]
    out = collapse_final_versioned(
        spark.createDataFrame(rows, _VSCHEMA),
        keys=["k"],
        sign="sign",
        version="ver",
        order=["seq"],
    ).collect()
    assert [(r.ver, r.payload) for r in out] == [(1, "new")]


def test_collapse_single_shuffle_plan(spark):
    """The FINAL view is one hash-aggregate shuffle on the key — no
    window sort, no join (the 100 TB shape shared with final_view)."""
    df = _log(spark, [("a", 1, "v1", 1)])
    plan = collapse_final(
        df, keys=["k"], sign="sign", order=["seq"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


def test_optimize_final_collapsing_rewrites_and_is_idempotent(spark, tmp_path):
    """OPTIMIZE FINAL for a sign-changelog table: the rewrite collapses
    physically, and a second run is a fixed point (every survivor is a
    lone ±1 for its key)."""
    from clickhub_spark.operators.mutate import optimize_final_collapsing

    path = str(tmp_path / "changelog")
    _log(
        spark,
        [
            ("a", 1, "v1", 1),
            ("a", 2, "v1", -1),
            ("a", 3, "v2", 1),   # net +1 -> v2 survives
            ("b", 1, "w1", 1),
            ("b", 2, "w1", -1),  # net 0 -> vanishes
            ("c", 1, "x1", -1),  # net -1 -> first cancel survives
        ],
    ).write.parquet(path)

    n = optimize_final_collapsing(
        spark, path, keys=["k"], sign="sign", order=["seq"], target_files=1
    )
    assert n == 2
    got = {(r.k, r.payload, r.sign) for r in spark.read.parquet(path).collect()}
    assert got == {("a", "v2", 1), ("c", "x1", -1)}

    n2 = optimize_final_collapsing(
        spark, path, keys=["k"], sign="sign", order=["seq"], target_files=1
    )
    assert n2 == 2
    got2 = {(r.k, r.payload, r.sign) for r in spark.read.parquet(path).collect()}
    assert got2 == got
