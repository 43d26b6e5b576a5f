"""ORDER BY … WITH FILL — ClickHouse's result-set gap filling.

ClickHouse semantics (docs: ORDER BY expr WITH FILL [FROM c] [TO c]
[STEP c] [INTERPOLATE (col …)]):

- a "spine" of grid points runs FROM (inclusive, default: min of the
  sort column in the result) TO (EXCLUSIVE, default: max, which IS
  included when TO is defaulted) by STEP (default 1 / INTERVAL 1 DAY
  for Date / INTERVAL 1 SECOND for DateTime);
- original rows are ALWAYS kept, including off-grid ones — fill only
  INSERTS missing grid points, it never drops or snaps rows;
- inserted rows carry column DEFAULTS (0 for numerics, '' for
  strings, [] for arrays) in every non-sort column, except columns
  listed in INTERPOLATE, which carry the previous row's value.

Spark shape: the spine is a one-row min/max aggregate exploded
through ``sequence()`` (the build is a single row regardless of data
volume), then a full-outer join back on the sort column — original
rows survive off-grid, grid points appear exactly once.  The only
data-volume work is the join against the (already aggregated,
presentation-sized) result.  INTERPOLATE uses an unpartitioned
``last(ignorenulls)`` window: WITH FILL is a presentation-layer
operator over a sorted result STREAM in ClickHouse too, so the
single-partition sort mirrors the engine's own final-merge stage —
do not apply it to unaggregated fact tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint"}


def _default_for(dtype: str) -> Column:
    """ClickHouse column default for inserted rows."""
    if dtype in _NUMERIC or dtype.startswith("decimal"):
        return F.lit(0).cast(dtype)
    if dtype in ("float", "double"):
        return F.lit(0.0).cast(dtype)
    if dtype == "string":
        return F.lit("")
    if dtype == "boolean":
        return F.lit(False)
    if dtype.startswith("array"):
        return F.array().cast(dtype)
    return F.lit(None).cast(dtype)


def _default_step(dtype: str) -> Column:
    if dtype in _NUMERIC:
        return F.lit(1)
    if dtype in ("float", "double"):
        return F.lit(1.0)
    if dtype == "date":
        return F.expr("INTERVAL 1 DAY")
    if dtype.startswith("timestamp"):
        return F.expr("INTERVAL 1 SECOND")
    raise ValueError(f"WITH FILL unsupported for sort column type {dtype!r}")


def with_fill(
    df: DataFrame,
    col: str,
    from_: Column | None = None,
    to: Column | None = None,
    step: Column | None = None,
    interpolate: tuple[str, ...] = (),
    desc: bool = False,
) -> DataFrame:
    """Insert missing grid rows along ``col`` (see module docstring).

    ``from_``/``to``/``step`` are Column literals (``F.lit``/
    ``F.expr``); ``to`` is exclusive per ClickHouse.  ``interpolate``
    columns carry the previous row's value into inserted rows instead
    of the type default.
    """
    dtypes = dict(df.dtypes)
    if col not in dtypes:
        raise ValueError(f"WITH FILL column {col!r} not in result {list(dtypes)}")
    dtype = dtypes[col]
    if (
        dtype not in _NUMERIC
        and dtype not in ("float", "double")
        and dtype != "date"
        and not dtype.startswith("timestamp")
    ):
        raise ValueError(f"WITH FILL unsupported for sort column type {dtype!r}")
    for c in interpolate:
        if c not in dtypes:
            raise ValueError(f"INTERPOLATE column {c!r} not in result")
        if c == col:
            raise ValueError("INTERPOLATE cannot target the fill column")
    if step is None:
        step = _default_step(dtype)

    # one-row bounds: always exactly one row (agg over empty df gives
    # NULL bounds -> sequence(NULL,…) -> NULL -> explode emits nothing)
    bounds = df.agg(F.min(col).alias("__lo"), F.max(col).alias("__hi"))
    lo = (from_ if from_ is not None else F.col("__lo")).cast(dtype)
    # TO is exclusive: sequence() is stop-inclusive, so overshoot is
    # trimmed with a filter below; the default (max) IS inclusive.
    hi = (to if to is not None else F.col("__hi")).cast(dtype)
    if dtype in ("float", "double"):
        # Spark's sequence() is integral/temporal-only; build the
        # float grid as lo + k·step over an integer index (one
        # multiply per point — no accumulated float error)
        n = F.floor((hi - lo) / step.cast("double")).cast("int")
        spine = bounds.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n, F.lit(0))),
                    lambda k: (lo + k.cast("double") * step.cast("double")).cast(dtype),
                )
            ).alias(col)
        )
    else:
        spine = bounds.select(F.explode(F.sequence(lo, hi, step)).alias(col))
    if to is not None:
        spine = spine.where(F.col(col) < to.cast(dtype))

    orig = df.withColumn("__orig", F.lit(True))
    joined = spine.join(orig, [col], "full_outer")
    is_orig = F.col("__orig").isNotNull()
    out_cols = [F.col(col)]
    for c in df.columns:
        if c == col:
            continue
        if c in interpolate:
            out_cols.append(F.col(c))  # carried below, post-sort
        else:
            out_cols.append(
                F.when(is_orig, F.col(c)).otherwise(_default_for(dtypes[c])).alias(c)
            )
    out = joined.select(*out_cols, is_orig.alias("__orig"))
    if interpolate:
        w = (
            Window.orderBy(F.col(col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in interpolate:
            # inserted rows take the previous row's value (ClickHouse
            # INTERPOLATE carry form); rows before the first original
            # row fall back to the column default.  NOTE: the selected
            # ``__orig`` is already the boolean is-original flag.
            carried = F.last(
                F.when(F.col("__orig"), F.col(c)), ignorenulls=True
            ).over(w)
            out = out.withColumn(
                c,
                F.when(F.col("__orig"), F.col(c)).otherwise(
                    F.coalesce(carried, _default_for(dtypes[c]))
                ),
            )
    out = out.drop("__orig")
    return out.orderBy(F.col(col).desc() if desc else F.col(col).asc())
