"""Rank-statistic operators with bounded-cardinality pivots.

Kendall tau-b (ClickHouse ``kendallRankCorrelation`` — reference
surface: the stats aggregate family) computed WITHOUT the O(n²) pair
scan: concordant/discordant totals close over per-(x, y) CELL counts.
The x axis is pivoted into columns of the distinct-y table, so the
technique requires x's cardinality to be BOUNDED — at 100 TB the
corpus shuffles once (the cell aggregate); every later stage touches
only the distinct-value table, whose width is K columns.

Round-7 generalization (VERDICT r6 item 5): the pivot width is no
longer a hardcoded 8 — callers either pass ``x_values`` explicitly
(no extra job; the registered-query path) or let the operator derive
them from the data, guarded by ``max_x_cardinality`` with an explicit
raise on overflow.  A high-cardinality x (e.g. a raw float) would
silently explode the pivoted row width otherwise — fail loudly and
tell the caller to bucket x first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["kendall_tau_b"]


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    seg_col: str | None = None,
    *,
    x_values: list | None = None,
    max_x_cardinality: int = 64,
    floor_scale: int = 1_000_000,
) -> DataFrame:
    """Kendall rank correlation tau-b between ``x_col`` and ``y_col``.

    Returns one row (``conc``, ``disc``, ``tau_b``) — or one per
    segment (``seg`` first) when ``seg_col`` is given.  ``tau_b`` is
    floor-scaled to ``1/floor_scale`` so two engines computing the
    same doubles render identically.

    ``x_values``: the ordered domain of ``x_col``.  Pass it when known
    (compile-time buckets like ``user_id % 8``) — no extra Spark job.
    When omitted the operator runs one distinct-collect to derive it
    and raises ``ValueError`` if more than ``max_x_cardinality``
    distinct values exist: the pivot materializes one column pair per
    x value, so an unbounded x must be bucketed by the caller first.
    The y axis stays rows, not columns, but the POOLED path broadcasts
    the distinct-y table back to the cells (and rides one
    single-partition cumulative window over it) — y's distinct count
    should fit a broadcast (≲ tens of millions; quantize a raw
    double y first, as the registered queries do).  The per-segment
    path shuffle-joins on (seg, y) and has no such bound.

    NULL x/y rows are excluded; NaN ``y`` is excluded the same way
    (NaN has no rank — counting it as a cell would silently disagree
    with any sequential-comparison oracle), while NaN in the x DOMAIN
    raises, matching the explicit-domain contract below.

    Rows whose x is not NULL but outside an EXPLICIT ``x_values`` are
    excluded from the statistic entirely (domain-restricted tau, the
    consistent reading) — never half-counted.

    Algorithm: cells = count per (x, y); pivot x into K columns over
    distinct y; cumulative strictly-below (lt) / strictly-above (gt)
    counts down the y axis; each unordered pair attributed once at its
    higher-x cell: conc = Σ n(x,y)·Σ_{x'<x} lt_{x'}(y), disc with gt.
    Tie terms are group-count algebra on the same cells table.  Exact
    int64 until the final sqrt/division.
    """
    if x_values is None:
        sample = [
            r[0]
            for r in df.select(x_col)
            .where(F.col(x_col).isNotNull())
            .distinct()
            .limit(max_x_cardinality + 1)
            .collect()
        ]
        if len(sample) > max_x_cardinality:
            raise ValueError(
                f"kendall_tau_b: {x_col!r} has more than {max_x_cardinality} "
                f"distinct values — the pivot would materialize one column "
                f"pair per value. Bucket {x_col!r} first (e.g. width_bucket/"
                f"ntile) or raise max_x_cardinality deliberately."
            )
        x_values = sample
    # NaN is unordered (every comparison false): it would silently
    # scramble Python's sort below AND Spark's when-chain equality —
    # refuse it rather than rank it arbitrarily (review r7).  The
    # caller-supplied list is deduped and SORTED here for the same
    # reason: rank order must be the domain's natural order, not
    # whatever order the caller typed.
    if any(isinstance(v, float) and v != v for v in x_values):
        raise ValueError(
            f"kendall_tau_b: {x_col!r} domain contains NaN — filter or "
            f"bucket NaN rows first (NaN has no rank)"
        )
    x_values = sorted(set(x_values))
    if len(x_values) < 2:
        raise ValueError(
            f"kendall_tau_b: need at least 2 distinct {x_col!r} values, "
            f"got {x_values!r}"
        )
    K = len(x_values)

    # dense-rank x into 0..K-1 with a bounded literal when-chain so the
    # pipeline below is domain-agnostic (ints, strings, dates all work)
    xi: Column = F.when(F.col(x_col) == F.lit(x_values[0]), F.lit(0))
    for i, v in enumerate(x_values[1:], start=1):
        xi = xi.when(F.col(x_col) == F.lit(v), F.lit(i))

    keys = [seg_col] if seg_col else []
    # NaN y is excluded like NULL y (ADVICE r7): NaN has no rank — it
    # would form its own groupBy cell and sort last in Spark's window
    # order, silently producing a tau no sequential-comparison oracle
    # agrees with.  Mirrors the x-domain NaN refusal, but plan-side
    # (no extra scan); only float y can carry NaN.
    y_ok = F.col(y_col).isNotNull()
    if dict(df.dtypes).get(y_col) in ("float", "double"):
        y_ok = y_ok & ~F.isnan(F.col(y_col))
    p = df.where(F.col(x_col).isNotNull() & y_ok).select(
        *keys, xi.alias("x"), F.col(y_col).alias("y")
    )
    # rows whose x is OUTSIDE x_values map to NULL in the when-chain;
    # they must be excluded from the WHOLE computation (n / tie terms
    # included), not just from conc/disc — half-counting them would
    # silently deflate tau (review r7).  With a data-derived domain
    # this filter matches nothing; with an explicit x_values it makes
    # the statistic domain-restricted by contract.
    p = p.where(F.col("x").isNotNull())
    cells = p.groupBy(*keys, "x", "y").agg(F.count(F.lit(1)).alias("n"))
    pv = (
        cells.groupBy(*keys, "y")
        .pivot("x", list(range(K)))
        .agg(F.sum("n"))
        .select(
            *keys,
            "y",
            *[
                F.coalesce(F.col(str(i)), F.lit(0)).alias(f"c{i}")
                for i in range(K)
            ],
        )
    )
    wlt = (
        Window.partitionBy(*keys)
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wle = (
        Window.partitionBy(*keys)
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lt_cols = [
        F.coalesce(F.sum(f"c{i}").over(wlt), F.lit(0)).alias(f"lt{i}")
        for i in range(K)
    ]
    if keys:
        # per-segment totals ride a partition-wide window — fully
        # distributed, no unpartitioned window anywhere
        wp = Window.partitionBy(*keys)
        cum = pv.select(
            *keys,
            "y",
            *lt_cols,
            *[
                (F.sum(f"c{i}").over(wp) - F.sum(f"c{i}").over(wle)).alias(
                    f"gt{i}"
                )
                for i in range(K)
            ],
        )
    else:
        # pooled: totals come from a single-row aggregate broadcast
        # across the distinct-y table (a whole-table window would add
        # a second SinglePartition pass)
        tots = pv.agg(*[F.sum(f"c{i}").alias(f"t{i}") for i in range(K)])
        cum = (
            pv.select("y", *lt_cols, *[F.sum(f"c{i}").over(wle).alias(f"le{i}") for i in range(K)])
            .crossJoin(F.broadcast(tots))
            .select(
                "y",
                *[F.col(f"lt{i}") for i in range(K)],
                *[
                    (F.col(f"t{i}") - F.col(f"le{i}")).alias(f"gt{i}")
                    for i in range(K)
                ],
            )
        )
    conc_expr = sum(
        F.when(F.col("x") > i, F.col(f"lt{i}")).otherwise(F.lit(0))
        for i in range(K - 1)
    )
    disc_expr = sum(
        F.when(F.col("x") > i, F.col(f"gt{i}")).otherwise(F.lit(0))
        for i in range(K - 1)
    )
    join_keys = [*keys, "y"]
    cum_side = cum if keys else F.broadcast(cum)
    cd = (
        cells.join(cum_side, join_keys)
        .groupBy(*keys)
        .agg(
            F.sum(F.col("n") * conc_expr).alias("conc"),
            F.sum(F.col("n") * disc_expr).alias("disc"),
        )
    )
    # tie terms and n derive from CELLS (exact integer sums) — never
    # re-scan the corpus for numbers the one shuffle already produced.
    # t·(t−1) is even, so shiftright-by-1 IS /2 in pure int64 — a
    # float division here would round past 2^53 (t > ~9.5e7 rows in
    # one tie group) and break the exact-int64 invariant (review r7);
    # int64 itself bounds the operator at ~4.3e9 corpus rows per
    # group, far past any single statistic's useful range.
    pair_sum = F.shiftright(F.col("t") * (F.col("t") - 1), 1)
    n1 = (
        cells.groupBy(*keys, "x")
        .agg(F.sum("n").alias("t"))
        .groupBy(*keys)
        .agg(F.sum(pair_sum).cast("long").alias("n1"))
    )
    n2 = (
        cells.groupBy(*keys, "y")
        .agg(F.sum("n").alias("t"))
        .groupBy(*keys)
        .agg(F.sum(pair_sum).cast("long").alias("n2"))
    )
    nn = cells.groupBy(*keys).agg(F.sum("n").alias("n"))
    if keys:
        j = cd.join(n1, keys).join(n2, keys).join(nn, keys)
    else:
        j = (
            cd.crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(n2))
            .crossJoin(F.broadcast(nn))
        )
    n0 = F.shiftright(F.col("n") * (F.col("n") - 1), 1)  # exact int64
    tau = (F.col("conc") - F.col("disc")) / (
        F.sqrt((n0 - F.col("n1")).cast("double"))
        * F.sqrt((n0 - F.col("n2")).cast("double"))
    )
    out = j.select(
        *([F.col(seg_col).alias("seg")] if seg_col else []),
        "conc",
        "disc",
        (F.floor(tau * floor_scale) / floor_scale).alias("tau_b"),
    )
    return out.orderBy("seg") if seg_col else out
