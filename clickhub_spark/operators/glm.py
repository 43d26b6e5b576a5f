"""Distributed generalized-linear-model fitting by IRLS.

ClickHouse ships ``stochasticLogisticRegression`` (SGD inside an
aggregate); the Spark-first re-expression is iteratively reweighted
least squares, where EVERY iteration is one map-side moment aggregate:
with the current coefficients β broadcast into the plan as literals,
compute p = σ(Xβ), w = p(1−p), working response z = Xβ + (y−p)/w, and
reduce the weighted Gram matrix XᵀWX (d×d) and moment vector XᵀWz (d)
as mergeable sums — the same partial+final shape as SUM.  The driver
solves the d×d system (numpy, bounded by feature count, never data
size) and re-broadcasts.  At 100 TB each iteration reads the corpus
once with NO shuffle beyond one row of partials per partition —
exactly the PCA/BPE driver-loop contract (operators/pca.py,
operators/bpe.py).

Oracle status: iterative fits are not SQL-expressible; correctness is
pinned by tests/test_glm.py (distributed fit ≡ single-node numpy IRLS
to ~1e-9, deviance decreases, separable-direction sanity) — the same
rows-only + equivalence-unit contract as PCA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["logistic_fit", "logistic_score", "irls_numpy"]


#: default L2 penalty for the Gram solve — ALSO the lambda the
#: stationarity certificate (q_llm_logreg_cert) checks the gradient
#: against; single-sourced so the fit and its certificate cannot
#: drift apart.
DEFAULT_RIDGE = 1e-6


def _moment_pass(df: DataFrame, feats: list, label: str, beta, ridge: float):
    """One IRLS iteration's aggregate: returns (XtWX, XtWz) as numpy.

    β enters the plan as literals, so the whole pass is a single
    whole-stage-codegen aggregate — no UDF, no shuffle of rows.
    """
    import numpy as np

    d = len(feats) + 1
    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feats]
    eta = sum(float(b) * c for b, c in zip(beta, cols))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    # clamp w away from 0 so z = eta + (y-p)/w stays finite when the
    # fit saturates (perfectly separated slices at some iteration)
    w = F.greatest(p * (F.lit(1.0) - p), F.lit(1e-10))
    y = F.col(label).cast("double")
    z = eta + (y - p) / w
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(w * cols[i] * cols[j]).alias(f"g_{i}_{j}"))
    for i in range(d):
        aggs.append(F.sum(w * cols[i] * z).alias(f"v_{i}"))
    row = df.agg(*aggs).collect()[0]
    G = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    G += ridge * np.eye(d)
    v = np.array([row[f"v_{i}"] for i in range(d)])
    return G, v


def logistic_fit(
    df: DataFrame,
    feature_cols: list,
    label_col: str,
    iters: int = 8,
    ridge: float = DEFAULT_RIDGE,
) -> list:
    """Fit logistic regression; returns [intercept, *coefficients].

    ``iters`` fixed-count IRLS steps (8 reaches ~1e-10 coefficient
    deltas on well-conditioned data; IRLS is Newton's method, so
    convergence is quadratic once near the optimum).  ``ridge`` keeps
    the Gram solve stable under collinear features.  Deterministic:
    no sampling, no init randomness (β₀ = 0), so re-running on the
    same data yields bit-identical coefficients.
    """
    import numpy as np

    # drop rows with a NULL label or feature up front: F.sum skips
    # NULLs per-EXPRESSION, so without this a NULL-label row would be
    # counted in the Gram sums (w·xᵢ·xⱼ, label-free) but skipped in
    # the moment-vector sums (w·xᵢ·z) — a silently inconsistent,
    # biased system rather than an error
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    df = df.where(cond)

    d = len(feature_cols) + 1
    beta = np.zeros(d)
    for _ in range(iters):
        G, v = _moment_pass(df, feature_cols, label_col, beta, ridge)
        beta = np.linalg.solve(G, v)
    return [float(b) for b in beta]


def logistic_score(df: DataFrame, feature_cols: list, beta: list) -> DataFrame:
    """Map-only scoring with broadcast-literal coefficients — the
    production shape of every linear quality classifier at 100 TB
    (q_llm_quality_classifier is this with published-style weights)."""
    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    eta = sum(float(b) * c for b, c in zip(beta, cols))
    return df.withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))


def irls_numpy(X, y, iters: int = 8, ridge: float = 1e-6):
    """Single-node reference IRLS on a dense design matrix (intercept
    prepended) — the equivalence oracle for logistic_fit."""
    import numpy as np

    X = np.column_stack([np.ones(len(X)), np.asarray(X, dtype=float)])
    y = np.asarray(y, dtype=float)
    beta = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(p * (1.0 - p), 1e-10)
        z = eta + (y - p) / w
        G = (X * w[:, None]).T @ X + ridge * np.eye(X.shape[1])
        v = (X * w[:, None]).T @ z
        beta = np.linalg.solve(G, v)
    return beta
