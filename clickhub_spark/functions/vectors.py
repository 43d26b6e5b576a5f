"""Vector math over array<float> embedding columns, expressed with
higher-order functions (zip_with / aggregate) so the arithmetic stays
JVM-side inside whole-stage codegen — no Python boundary crossing
(SURVEY §2.J6).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """Cast array<float> → array<double>; fp32 parquet values promote
    exactly, and all downstream math is then double-deterministic."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def maxabs(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))


def quantize_int8(vec: Column, scale: Column | None = None) -> Column:
    """Symmetric max-abs int8 quantization: q_i = round(v_i·127/maxabs)
    as tinyint.  With the per-vector ``maxabs`` scale stored alongside
    (see dequantize_int8), this is the 4×-smaller embedding storage
    tier below PQ (which is ~32×): full dimensionality kept, ~0.5 bit
    of mantissa lost — cosine recall is visually unchanged (unit-
    tested ≥ 0.999 reconstruction cosine).  Pure codegen expressions;
    no Python.

    Pass ``scale`` as a materialized column (``withColumn("s",
    maxabs(v))``) in bulk-encode jobs: inlining the maxabs aggregate
    into the per-element lambda makes the expression O(dim²) per row —
    measured 5× slower at 64 dims."""
    s = maxabs(vec) if scale is None else scale
    return F.transform(
        vec,
        lambda x: F.when(s == 0.0, F.lit(0))
        .otherwise(F.round(x * 127.0 / s))
        .cast("tinyint"),
    )


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Inverse of quantize_int8 given the stored maxabs scale."""
    return F.transform(q, lambda c: c.cast("double") * scale / 127.0)


def nearest_centroid(
    vec: Column,
    centroids: list[tuple[int, list[float]]],
    pre_normalized: bool = False,
) -> Column:
    """Map-only nearest-centroid assignment against a bounded centroid
    parameter table inlined as plan literals (the IVF-centroid
    contract: k ≪ corpus, collected driver-side once).  Returns a
    struct ``{sim, cluster}`` — cosine to the winning centroid and its
    id; ties break to the LOWEST centroid id.  No join, no Exchange:
    the k-way scoring is one codegen'd array expression per row.

    ``pre_normalized=True`` is the efficient form: the CALLER passes a
    unit-length ``vec`` (normalize once per row, materialized as a
    column) and the centroid literals are normalized here driver-side,
    so each of the k scores is a single dot-product fold.  The default
    form folds cosine per centroid — norm(vec) is then re-reduced k
    times per row, ~2× the array folds at k=8 and worse as k grows."""

    # r16 (driver-side build cost): the r15 form constructed k×dim
    # separate F.lit() Columns plus one fold expression PER centroid —
    # ~2,900 py4j round-trips at k=45/dim=64, ~3 s of pure driver time
    # per DataFrame build (measured; the count+collect feeding it cost
    # 0.33 s).  Now the centroid matrix and id list are each ONE
    # F.expr() parse of a SQL array literal (repr() round-trips every
    # float64 exactly), and the k-way scoring is a single zip_with
    # lambda over them.  Per-row arithmetic is unchanged: the same
    # sequential dot/cosine fold per centroid, the same
    # array_max(struct(sim, negid)) lowest-id tie-break.

    def _vals(cv: list[float]) -> list[float]:
        # ADVICE r16: a NaN/Inf coordinate would render as 'nanD'/'infD'
        # in the SQL array literal below and fail to parse at build
        # time with an opaque ParseException — fail with the real cause
        if not all(math.isfinite(float(x)) for x in cv):
            raise ValueError(
                "non-finite centroid coordinate (NaN/Inf) cannot be "
                f"rendered as a SQL literal: {cv!r}"
            )
        if pre_normalized:
            n = sum(float(x) * float(x) for x in cv) ** 0.5 or 1.0
            return [float(x) / n for x in cv]
        return [float(x) for x in cv]

    cents = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{v!r}D" for v in _vals(cv)) + ")"
            for _, cv in centroids
        )
        + ")"
    )
    ids = F.expr(
        "array(" + ",".join(f"{-int(cid)}L" for cid, _ in centroids) + ")"
    )
    score = dot if pre_normalized else cosine
    arr = F.zip_with(
        cents,
        ids,
        lambda cv, negid: F.struct(
            score(vec, cv).alias("sim"), negid.alias("negid")
        ),
    )
    best = F.array_max(arr)
    return F.struct(
        best["sim"].alias("sim"), (-best["negid"]).alias("cluster")
    )


def nearest_centroid_vectorized(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Large-k tier of nearest-centroid assignment: an Arrow-batched
    pandas_udf holding the centroid matrix as a closure-broadcast
    numpy array and scoring each batch with ONE normalized matmul
    (batch×dim @ dim×k).  Still map-only — no join, no shuffle — but
    where the literal-inline form (`nearest_centroid`) compiles k·dim
    literals into one expression (fine to k≈64, then codegen methods
    blow past JIT limits), this scales to the k≈10⁴ cells real
    SemDeDup/IVF builds use: the matrix rides the task broadcast once
    per executor and each Arrow batch costs one BLAS call.

    Tie-break matches the inline form (lowest centroid id wins):
    centroids are sorted by id and argmax returns the first maximum.
    Last-ulp float differences vs the sequential codegen fold are
    possible (BLAS reassociates); unit-tested equivalent on the
    synthetic corpus."""
    from pyspark.sql.functions import pandas_udf

    cent = sorted(centroids, key=lambda c: c[0])
    cids = np.array([c for c, _ in cent], dtype=np.int64)
    m = np.array([v for _, v in cent], dtype=np.float64)
    m_norm = m / np.linalg.norm(m, axis=1, keepdims=True)

    @pandas_udf("struct<sim: double, cluster: bigint>")
    def _assign(s: pd.Series) -> pd.DataFrame:
        x = np.array(s.tolist(), dtype=np.float64)
        x_norm = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = x_norm @ m_norm.T
        idx = sims.argmax(axis=1)
        return pd.DataFrame(
            {"sim": sims[np.arange(len(idx)), idx], "cluster": cids[idx]}
        )

    return _assign(vec)
