"""operators/glm — distributed IRLS logistic regression.

Contract (the PCA precedent): no SQL oracle exists for an iterative
fit, so correctness is distributed ≡ single-node equivalence — the
Spark moment-pass loop must reproduce the numpy IRLS reference to
near machine precision, because both run the SAME algorithm on the
SAME data (the distributed form only changes WHERE the sums happen).
"""

import numpy as np
from pyspark.sql import functions as F

from clickhub_spark.operators.glm import irls_numpy, logistic_fit, logistic_score


def _toy(spark, n=2000, seed=3):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    p = 1.0 / (1.0 + np.exp(-(0.5 + 1.5 * x1 - 0.8 * x2)))
    y = (rng.random(n) < p).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y int",
    )
    return df, np.column_stack([x1, x2]), y


def test_distributed_fit_equals_numpy_irls(spark):
    df, X, y = _toy(spark)
    beta_d = np.array(logistic_fit(df, ["x1", "x2"], "y"))
    beta_s = irls_numpy(X, y)
    # same algorithm, same iteration count, same ridge — only the
    # summation order differs (partial aggregation), so agreement is
    # near machine precision, far inside any statistical noise
    assert np.allclose(beta_d, beta_s, atol=1e-8), (beta_d, beta_s)


def test_fit_recovers_generating_coefficients(spark):
    df, X, y = _toy(spark, n=8000, seed=11)
    b0, b1, b2 = logistic_fit(df, ["x1", "x2"], "y")
    # true (0.5, 1.5, -0.8); 8k samples bound the standard error ~0.05
    assert abs(b0 - 0.5) < 0.2
    assert abs(b1 - 1.5) < 0.2
    assert abs(b2 + 0.8) < 0.2


def test_score_is_monotone_in_eta_and_bounded(spark):
    df, _, _ = _toy(spark, n=500)
    beta = logistic_fit(df, ["x1", "x2"], "y")
    scored = logistic_score(df, ["x1", "x2"], beta)
    rows = scored.select("x1", "x2", "y", "score").collect()
    assert all(0.0 < r.score < 1.0 for r in rows)
    # classifier beats chance on its own training data
    acc = np.mean([(r.score > 0.5) == bool(r.y) for r in rows])
    assert acc > 0.7


def test_deterministic_refit(spark):
    df, _, _ = _toy(spark, n=800, seed=7)
    a = logistic_fit(df, ["x1", "x2"], "y")
    b = logistic_fit(df, ["x1", "x2"], "y")
    assert a == b  # zero-init + fixed iterations: bit-identical


def test_saturated_slice_stays_finite(spark):
    # perfectly separable data: the w clamp must keep z finite and
    # the ridge must keep the solve stable
    rows = [(float(i), int(i >= 0)) for i in range(-50, 50)]
    df = spark.createDataFrame(rows, "x1 double, y int")
    beta = logistic_fit(df, ["x1"], "y", iters=6)
    assert all(np.isfinite(beta))
    assert beta[1] > 0  # direction recovered


def test_null_rows_are_dropped_not_half_counted(spark):
    """A NULL label (or feature) must not contribute to EITHER side of
    the normal equations.  F.sum skips NULLs per-expression, so before
    the explicit filter a NULL-label row entered the Gram sums (which
    never touch the label) but not the moment-vector sums — a biased
    system, not a crash.  Fit with NULL rows appended must equal the
    fit on the clean frame exactly."""
    df, X, y = _toy(spark, n=600, seed=5)
    dirty = df.unionByName(
        spark.createDataFrame(
            [(2.0, 2.0, None), (None, 0.5, 1), (0.5, None, 0)],
            "x1 double, x2 double, y int",
        )
    )
    clean = np.array(logistic_fit(df, ["x1", "x2"], "y"))
    with_nulls = np.array(logistic_fit(dirty, ["x1", "x2"], "y"))
    assert np.allclose(clean, with_nulls, atol=1e-12), (clean, with_nulls)
