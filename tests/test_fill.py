"""ORDER BY … WITH FILL (operators/fill.py + sql_compat delegation).

ClickHouse semantics pinned: TO is exclusive, off-grid original rows
are kept (fill only inserts), inserted rows carry column type
defaults (0 / '' / []) except INTERPOLATE columns which carry the
previous row's value, and rows before the first original row fall
back to the default.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from clickhub_spark import sql_compat
from clickhub_spark.operators.fill import with_fill


@pytest.fixture()
def t_fill(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (4, "b", 40.0), (9, "c", 90.0)], "x int, s string, v double"
    )
    df.createOrReplaceTempView("t_fill")
    return df


def test_fill_inserts_defaults_and_keeps_off_grid(spark, t_fill):
    out = sql_compat.run(
        spark, "SELECT x, s, v FROM t_fill ORDER BY x WITH FILL FROM 0 TO 12 STEP 3"
    ).collect()
    # grid 0,3,6,9 plus off-grid originals 1 and 4
    assert [(r.x, r.s, r.v) for r in out] == [
        (0, "", 0.0),
        (1, "a", 10.0),
        (3, "", 0.0),
        (4, "b", 40.0),
        (6, "", 0.0),
        (9, "c", 90.0),
    ]


def test_fill_to_is_exclusive_and_extends_past_max(spark, t_fill):
    out = sql_compat.run(
        spark, "SELECT x, s FROM t_fill ORDER BY x WITH FILL FROM 9 TO 12"
    ).collect()
    # FROM 9 TO 12 -> grid 9,10,11 (12 excluded); originals 1,4 kept
    assert [r.x for r in out] == [1, 4, 9, 10, 11]
    assert [r.s for r in out] == ["a", "b", "c", "", ""]


def test_fill_default_bounds_are_min_max_inclusive(spark, t_fill):
    out = sql_compat.run(
        spark, "SELECT x, s FROM t_fill ORDER BY x WITH FILL"
    ).collect()
    assert [r.x for r in out] == list(range(1, 10))


def test_fill_interpolate_carries_previous_value(spark, t_fill):
    out = sql_compat.run(
        spark, "SELECT x, v FROM t_fill ORDER BY x WITH FILL INTERPOLATE (v)"
    ).collect()
    assert [(r.x, r.v) for r in out] == [
        (1, 10.0), (2, 10.0), (3, 10.0), (4, 40.0),
        (5, 40.0), (6, 40.0), (7, 40.0), (8, 40.0), (9, 90.0),
    ]


def test_fill_interpolate_before_first_row_uses_default(spark, t_fill):
    out = sql_compat.run(
        spark,
        "SELECT x, v FROM t_fill ORDER BY x WITH FILL FROM -2 TO 2 INTERPOLATE (v)",
    ).collect()
    assert [(r.x, r.v) for r in out][:4] == [
        (-2, 0.0), (-1, 0.0), (0, 0.0), (1, 10.0),
    ]


def test_fill_desc_sorts_descending(spark, t_fill):
    out = sql_compat.run(
        spark, "SELECT x, s FROM t_fill ORDER BY x DESC WITH FILL"
    ).collect()
    assert [r.x for r in out] == list(range(9, 0, -1))


def test_fill_date_spine(spark):
    d = datetime.date
    df = spark.createDataFrame(
        [(d(2024, 1, 1), 5), (d(2024, 1, 4), 7)], "day date, n int"
    )
    out = with_fill(df, "day").collect()
    assert [r.day.day for r in out] == [1, 2, 3, 4]
    assert [r.n for r in out] == [5, 0, 0, 7]


def test_fill_timestamp_step_interval(spark):
    ts = datetime.datetime
    df = spark.createDataFrame(
        [(ts(2024, 1, 1, 0), 1), (ts(2024, 1, 1, 3), 2)], "h timestamp, n int"
    )
    out = with_fill(df, "h", step=F.expr("INTERVAL 1 HOUR")).collect()
    assert [r.h.hour for r in out] == [0, 1, 2, 3]
    assert [r.n for r in out] == [1, 0, 0, 2]


def test_fill_empty_input_yields_empty(spark):
    df = spark.createDataFrame([], "x int, n int")
    assert with_fill(df, "x").count() == 0


def test_fill_real_nulls_in_original_rows_survive(spark):
    df = spark.createDataFrame([(1, None), (3, 30.0)], "x int, v double")
    out = with_fill(df, "x").collect()
    # the ORIGINAL row's NULL is kept (only inserted rows get defaults)
    assert [(r.x, r.v) for r in out] == [(1, None), (2, 0.0), (3, 30.0)]


def test_fill_rejects_bad_columns(spark, t_fill):
    with pytest.raises(ValueError, match="not in result"):
        with_fill(t_fill, "nope")
    with pytest.raises(ValueError, match="unsupported"):
        with_fill(t_fill.select("s", "x"), "s")
    with pytest.raises(ValueError, match="INTERPOLATE"):
        with_fill(t_fill, "x", interpolate=("x",))


def test_parse_with_fill_forms():
    inner, kw = sql_compat.parse_with_fill(
        "SELECT d, n FROM t ORDER BY d WITH FILL FROM toDate('2024-01-01') "
        "TO toDate('2024-02-01') STEP INTERVAL 1 DAY"
    )
    assert inner.rstrip().endswith("FROM t")
    assert kw["col"] == "d" and not kw["desc"]
    assert kw["from_"] is not None and kw["to"] is not None
    assert sql_compat.parse_with_fill("SELECT 1") is None
    # inside a string literal: not a fill clause
    assert (
        sql_compat.parse_with_fill("SELECT 'ORDER BY x WITH FILL' AS s FROM t")
        is None
    )
    with pytest.raises(ValueError, match="unsupported WITH FILL"):
        sql_compat.parse_with_fill(
            "SELECT a, b FROM t ORDER BY a, b WITH FILL"
        )
