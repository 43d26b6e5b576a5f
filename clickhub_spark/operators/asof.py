"""As-of join — for each left row, the latest right row with
right.ts <= left.ts per key (SURVEY §2.C8; the reference's prev_*
columns in line_changes, README.md:184-186, are a precomputed as-of).

Spark SQL has no native ASOF JOIN, so we use the union+window trick:
tag both sides, union on (key, ts), sort within key, carry the last
right row forward with last(..., ignorenulls=True), keep left rows.

Scale notes: one shuffle on the key (same as any join), no range
explosion — this beats a range-join + row_number at 100 TB because
the window never materializes candidate pairs.  Skewed keys behave
like any windowed aggregation (AQE cannot split a single hot key for
window fns; salt upstream if one key dominates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: nearest right value at-or-before
    (``direction="backward"``, the default — ClickHouse `ASOF JOIN ...
    <=`) or at-or-after (``direction="forward"``, `>=`) each left row.

    ``right_values`` columns appear on the output prefixed ``asof_``.
    ``tolerance`` (seconds) optionally discards matches further than
    that from left_ts in the join direction.
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, right_values, tolerance
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = (
        right.select(
            *on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_values],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in right_values:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    cols = list(dict.fromkeys([*on, "__ts", "__side", *left.columns, *right_values]))
    unioned = lhs.select(*cols).unionByName(rhs.select(*cols))

    # Right rows sort before left rows at the same timestamp (__side 0
    # first) so an exactly-equal right timestamp IS visible to the left
    # row.  Forward direction is the same single linear pass with the
    # time axis reversed — the frame then looks at rows with ts >=
    # current instead of <=.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in right_values:
        out = out.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    out = out.withColumn(
        "asof_ts",
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w),
    )
    out = out.where(F.col("__side") == 1)
    if tolerance is not None:
        # TIMESTAMP_NTZ refuses numeric casts; reinterpret in the
        # session zone first (wall-clock deltas are zone-invariant)
        def _epoch(c: str) -> F.Column:
            col = F.col(c)
            if dict(out.dtypes).get(c) == "timestamp_ntz":
                col = col.cast("timestamp")
            return col.cast("double")

        gap = (
            _epoch("__ts") - _epoch("asof_ts")
            if direction == "backward"
            else _epoch("asof_ts") - _epoch("__ts")
        )
        too_old = F.col("asof_ts").isNull() | (gap > tolerance)
        for c in right_values:
            out = out.withColumn(
                f"asof_{c}", F.when(too_old, F.lit(None)).otherwise(F.col(f"asof_{c}"))
            )
        out = out.withColumn("asof_ts", F.when(too_old, F.lit(None)).otherwise(F.col("asof_ts")))
    return out.select(*left.columns, *[f"asof_{c}" for c in right_values], "asof_ts")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance: int | None,
) -> DataFrame:
    """``direction="nearest"`` (pandas merge_asof parity): the closer
    of the at-or-before and after matches, ties preferring backward
    (an exact-timestamp match has gap 0 and always wins).  BOTH
    direction passes run over ONE union + ONE partitioning: backward
    is last() over (unbounded preceding, current], forward is first()
    over [current, unbounded following) on the same ascending sort —
    no second shuffle, no second sort.  (A forward-only equal-ts
    match cannot exist without also being a backward match, so the
    forward frame's equal-ts blindness is unobservable.)"""
    on = list(on)
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = right.select(
        *on, F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_values]
    ).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in right_values:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    cols = list(dict.fromkeys([*on, "__ts", "__side", *left.columns, *right_values]))
    unioned = lhs.select(*cols).unionByName(rhs.select(*cols))

    base = Window.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__side").asc())
    w_back = base.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = base.rowsBetween(0, Window.unboundedFollowing)
    right_only = lambda c: F.when(F.col("__side") == 0, F.col(c))  # noqa: E731
    out = unioned
    for c in [*right_values, "__ts"]:
        tag = "ts" if c == "__ts" else c
        out = out.withColumn(
            f"__b_{tag}", F.last(right_only(c), ignorenulls=True).over(w_back)
        ).withColumn(
            f"__f_{tag}", F.first(right_only(c), ignorenulls=True).over(w_fwd)
        )
    out = out.where(F.col("__side") == 1)

    def _epoch(col: F.Column, dtype_src: str) -> F.Column:
        if dict(out.dtypes).get(dtype_src) == "timestamp_ntz":
            col = col.cast("timestamp")
        return col.cast("double")

    gap_b = _epoch(F.col("__ts"), "__ts") - _epoch(F.col("__b_ts"), "__b_ts")
    gap_f = _epoch(F.col("__f_ts"), "__f_ts") - _epoch(F.col("__ts"), "__ts")
    use_back = F.col("__f_ts").isNull() | (
        F.col("__b_ts").isNotNull() & (gap_b <= gap_f)
    )
    for c in right_values:
        out = out.withColumn(
            f"asof_{c}", F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
        )
    out = out.withColumn(
        "asof_ts", F.when(use_back, F.col("__b_ts")).otherwise(F.col("__f_ts"))
    )
    if tolerance is not None:
        gap = F.abs(_epoch(F.col("__ts"), "__ts") - _epoch(F.col("asof_ts"), "asof_ts"))
        too_far = F.col("asof_ts").isNull() | (gap > tolerance)
        for c in right_values:
            out = out.withColumn(
                f"asof_{c}", F.when(too_far, F.lit(None)).otherwise(F.col(f"asof_{c}"))
            )
        out = out.withColumn(
            "asof_ts", F.when(too_far, F.lit(None)).otherwise(F.col("asof_ts"))
        )
    return out.select(*left.columns, *[f"asof_{c}" for c in right_values], "asof_ts")
