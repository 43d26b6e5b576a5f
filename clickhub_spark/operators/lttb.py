"""Largest-Triangle-Three-Buckets downsampling — ClickHouse
``largestTriangleThreeBuckets(n)(x, y)`` (Steinarsson 2013), the
time-series decimation aggregate observability pipelines run before
plotting/alerting at 100 TB.

Algorithm (canonical): keep the first and last points; split the
interior into ``n_out - 2`` equal-count index buckets; walk the
buckets left to right, selecting from each the point forming the
LARGEST triangle with the PREVIOUSLY SELECTED point and the average
of the NEXT bucket (the last interior bucket anchors on the final
point).  The selection is a sequential greedy over buckets — state is
one point.

Spark-first shape: one ``applyInPandas`` per series with a vectorized
numpy loop over buckets (n_out is small; the per-bucket argmax is one
vectorized cross-product).  Per-series memory holds that series'
points — the same state the engine's own aggregate buffers — so the
operator parallelizes across series (the 100 TB axis: metrics
pipelines have millions of series of bounded length).  Output is
(series, bucket, x, y): n_out rows per series, plottable directly.

The greedy recurrence is fully re-verifiable DISTRIBUTED from the
output alone (q_agg_lttb_cert): endpoints preserved + exactly one
point per bucket + every selected point maximizes the triangle area
given its predecessor and next-bucket anchor — by induction that is
the whole algorithm, the q_llm_logreg_cert posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_of(rank: F.Column, n: F.Column, n_out: int) -> F.Column:
    """Interior bucket id (0-based) of the 0-based ``rank`` within an
    ``n``-point series, under the canonical equal-count split of
    indices 1..n-2 into ``n_out - 2`` buckets; -1 for the first point
    and ``n_out - 2``... the LAST point gets bucket ``n_out - 1`` so
    (first, interior 0..n_out-3, last) are distinct.  Pure integer
    arithmetic — the certification recomputes it exactly.

    Bucket boundaries: interior index j (= rank - 1, 0-based over the
    n-2 interior points) lands in bucket floor(j * (n_out-2) / (n-2)).
    """
    interior = ((rank - 1) * (n_out - 2)) / (n - 2)
    return (
        F.when(rank == 0, F.lit(-1))
        .when(rank == n - 1, F.lit(n_out - 1))
        .otherwise(F.floor(interior))
        .cast("int")
    )


def lttb(
    df: DataFrame,
    series_col: str,
    x_col: str,
    y_col: str,
    n_out: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Downsample each series to ``n_out`` points (series of ``n_out``
    points or fewer pass through whole).  ``x_col``/``y_col`` must be
    castable to double; rows with a NULL x or y are dropped (they have
    no position on the plane).  ``order_cols``: extra tiebreaker
    columns appended after x in the per-series sort, making rank
    assignment deterministic under x ties.

    Returns (series_col, bucket, rank, x, y): rank is the selected
    point's 0-based position in the sorted series (the certification's
    join key); bucket ∈ {-1 (first), 0..n_out-3 (interior), n_out-1
    (last)} for full-length series and bucket = rank for pass-through
    series.
    """
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first + interior + last)")
    import numpy as np
    import pandas as pd

    # sort key: x first, then the caller's tiebreakers (x_col itself
    # is renamed __x in the projection below)
    ties = [c for c in (order_cols or []) if c not in (x_col, series_col)]
    sort_keys = ["__x", *ties]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_keys, kind="mergesort")
        x = pdf["__x"].to_numpy(dtype="float64")
        y = pdf["__y"].to_numpy(dtype="float64")
        n = len(x)
        series = pdf[series_col].iloc[0]
        if n <= n_out:
            return pd.DataFrame(
                {
                    series_col: series,
                    "bucket": np.arange(n, dtype="int32"),
                    "rank": np.arange(n, dtype="int64"),
                    "x": x,
                    "y": y,
                }
            )
        nb = n_out - 2
        # equal-count split of interior indices: the INVERSE of
        # bucket_of's floor((rank-1)·nb/(n-2)) — interior j (0-based)
        # belongs to bucket b iff j ∈ [ceil(b(n-2)/nb), ceil((b+1)(n-2)/nb))
        # — so the certification's per-rank bucket recomputation
        # partitions identically (a floor-based range split would
        # disagree on boundary indices when nb ∤ n-2)
        bound = [-((-b * (n - 2)) // nb) for b in range(nb + 1)]
        sel_idx = [0]
        sel_bucket = [-1]
        ax, ay = x[0], y[0]  # previously selected point
        for b in range(nb):
            s, e = bound[b] + 1, bound[b + 1] + 1  # ranks
            if b + 1 < nb:
                ns, ne = bound[b + 1] + 1, bound[b + 2] + 1
                cx, cy = x[ns:ne].mean(), y[ns:ne].mean()
            else:
                cx, cy = x[n - 1], y[n - 1]
            # triangle area × 2 (|cross product|); same formula the
            # certification recomputes JVM-side
            area = np.abs(
                (ax - cx) * (y[s:e] - ay) - (ax - x[s:e]) * (cy - ay)
            )
            j = s + int(np.argmax(area))
            sel_idx.append(j)
            sel_bucket.append(b)
            ax, ay = x[j], y[j]
        sel_idx.append(n - 1)
        sel_bucket.append(n_out - 1)
        ii = np.asarray(sel_idx)
        return pd.DataFrame(
            {
                series_col: series,
                "bucket": np.asarray(sel_bucket, dtype="int32"),
                "rank": ii,
                "x": x[ii],
                "y": y[ii],
            }
        )

    src = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(series_col),
        *[F.col(c) for c in ties],
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    series_t = dict(df.dtypes)[series_col]
    return src.groupBy(series_col).applyInPandas(
        fit,
        f"{series_col} {series_t}, bucket int, rank long, "
        "x double, y double",
    )
