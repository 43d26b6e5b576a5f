"""Binned range join — the scale-safe plan for point-in-interval
predicates (SURVEY §2.C7 extension; complements the equi-prefix range
join in plans/queries_join.py).

A bare ``p BETWEEN start AND end`` join has no equi-key, so Spark
plans BroadcastNestedLoopJoin (fine only while one side broadcasts)
or a cartesian product (never fine).  Binning converts it to an
equi-join: every interval is exploded to the coarse bins it covers,
every point carries its bin, the join runs hash-partitioned on the
bin key, and the exact range predicate is applied as a residual
filter.  Cost: |intervals| × (len/bin_width + 1) replicated interval
rows — pick ``bin_width`` near the typical interval length so the
blow-up is ~2×.  Both sides shuffle once on the bin; no nested loop
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _last_bin(end_col: str, bin_width: int) -> F.Column:
    """Last bin covered by a half-open interval ending at ``end_col``:
    floor(end/w), minus one when end sits EXACTLY on a bin boundary
    (that bin contains no part of the interval).  Correct for integer
    AND fractional coordinates — the previous floor((end-1)/w) form
    under-covered fractional bounds (e.g. [9.8, 10.5) with w=10 never
    reached bin 1 and silently dropped true matches)."""
    return F.floor(F.col(end_col) / bin_width) - F.when(
        F.col(end_col) % bin_width == 0, 1
    ).otherwise(0)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join points to half-open intervals [start, end) on numeric
    columns (convert dates with unix_date first).  Each (point,
    interval) pair meets in exactly one bin — the point's — so no
    post-join dedup is needed.

    Only ``how="inner"`` is supported: the exact range predicate runs
    as a residual filter AFTER the bin equi-join, which would silently
    turn any outer join back into an inner one (NULL interval bounds
    fail the residual) — refusing loudly beats lying."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if how != "inner":
        raise ValueError(
            "point_in_interval_join supports how='inner' only: the "
            "residual range filter after the bin join would drop the "
            "unmatched rows an outer join promises to keep"
        )
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bin_width))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                _last_bin(end_col, bin_width),
            )
        ),
    )
    return (
        p.join(iv, "__bin", how)
        .where((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open [s, e) semantics):
    pairs where ``left`` and ``right`` overlap, without a nested
    loop.  Both sides explode to their covered bins and equi-join on
    the bin; the residual predicate keeps true overlaps.  A pair can
    share MANY bins, so each pair is attributed to exactly one owner
    bin — the bin containing the overlap's start (max of the two
    starts) — which dedups without any post-join ``distinct``
    (no second shuffle).

    The two frames' column sets must be DISJOINT (rename one side
    first): the bin equi-join keeps both schemas, so any shared name
    — including ``left_start == right_start`` — would make the
    residual overlap/owner predicates ambiguous at resolution time
    (ADVICE r5); validated up front with a clear error."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    clash = sorted(set(left.columns) & set(right.columns))
    if clash:
        raise ValueError(
            f"interval_overlap_join requires disjoint column names; "
            f"shared: {clash} — rename one side (e.g. "
            f"df.select([F.col(c).alias('r_' + c) for c in df.columns]))"
        )
    lb = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / bin_width),
                _last_bin(left_end, bin_width),
            )
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bin_width),
                _last_bin(right_end, bin_width),
            )
        ),
    )
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    owner = (
        F.floor(F.greatest(F.col(left_start), F.col(right_start)) / bin_width)
        == F.col("__bin")
    )
    return lb.join(rb, "__bin").where(overlap & owner).drop("__bin")
