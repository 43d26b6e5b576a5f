"""operators/stats.kendall_tau_b — the generalized pivot-cumulative
Kendall tau-b (VERDICT r6 item 5: the registered query's x domain was
a hardcoded mod-8; the operator must handle any bounded domain and
raise loudly on an unbounded one).

Ground truth is a brute-force O(n²) pair scan in numpy — exact
integer concordant/discordant counts and the identical tau-b formula,
so comparisons are exact for conc/disc and 1e-9-tight for tau.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhub_spark.operators.stats import kendall_tau_b


def brute_tau(xs, ys):
    xs, ys = np.asarray(xs), np.asarray(ys)
    n = len(xs)
    conc = disc = 0
    for i in range(n):
        dx = xs[i + 1 :] - xs[i]
        dy = ys[i + 1 :] - ys[i]
        s = np.sign(dx) * np.sign(dy)
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    n0 = n * (n - 1) // 2
    tx = sum(c * (c - 1) // 2 for c in np.unique(xs, return_counts=True)[1])
    ty = sum(c * (c - 1) // 2 for c in np.unique(ys, return_counts=True)[1])
    tau = (conc - disc) / (np.sqrt(float(n0 - tx)) * np.sqrt(float(n0 - ty)))
    return conc, disc, tau


def _mkdf(spark, xs, ys, seg=None):
    if seg is None:
        return spark.createDataFrame(
            [(int(x), float(y)) for x, y in zip(xs, ys)], "x long, y double"
        )
    return spark.createDataFrame(
        [(int(s), int(x), float(y)) for s, x, y in zip(seg, xs, ys)],
        "seg long, x long, y double",
    )


def test_non8_cardinality_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 13, 300)  # K=13, not the registered query's 8
    ys = np.round(rng.normal(size=300), 1)  # heavy y ties
    row = kendall_tau_b(
        _mkdf(spark, xs, ys), "x", "y", x_values=list(range(13))
    ).collect()[0]
    conc, disc, tau = brute_tau(xs, ys)
    assert (row.conc, row.disc) == (conc, disc)
    assert abs(row.tau_b - np.floor(tau * 1e6) / 1e6) < 1e-12


def test_derived_domain_and_gaps(spark):
    # domain derived from the data (no x_values) with gaps + negatives
    rng = np.random.default_rng(11)
    xs = rng.choice([-5, 0, 3, 42], 200)
    ys = rng.integers(0, 6, 200).astype(float)
    row = kendall_tau_b(_mkdf(spark, xs, ys), "x", "y").collect()[0]
    conc, disc, tau = brute_tau(xs, ys)
    assert (row.conc, row.disc) == (conc, disc)
    assert abs(row.tau_b - np.floor(tau * 1e6) / 1e6) < 1e-12


def test_per_segment_matches_bruteforce(spark):
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 3, 400)
    xs = rng.integers(0, 5, 400)
    ys = np.round(rng.normal(size=400), 1)
    out = {
        r.seg: r
        for r in kendall_tau_b(
            _mkdf(spark, xs, ys, seg), "x", "y", seg_col="seg",
            x_values=list(range(5)),
        ).collect()
    }
    for s in (0, 1, 2):
        m = seg == s
        conc, disc, tau = brute_tau(xs[m], ys[m])
        assert (out[s].conc, out[s].disc) == (conc, disc), s
        assert abs(out[s].tau_b - np.floor(tau * 1e6) / 1e6) < 1e-12, s


def test_cardinality_overflow_raises(spark):
    df = spark.range(100).select(
        F.col("id").alias("x"), (F.col("id") % 7).cast("double").alias("y")
    )
    with pytest.raises(ValueError, match="distinct values"):
        kendall_tau_b(df, "x", "y", max_x_cardinality=16)


def test_degenerate_domain_raises(spark):
    df = spark.range(10).select(
        F.lit(1).alias("x"), F.col("id").cast("double").alias("y")
    )
    with pytest.raises(ValueError, match="at least 2"):
        kendall_tau_b(df, "x", "y")


def test_string_x_domain(spark):
    # non-numeric x: ordering is lexicographic over the derived domain
    rows = [("a", 1.0), ("b", 2.0), ("c", 3.0), ("a", 2.0), ("c", 1.0),
            ("b", 3.0), ("a", 1.0), ("c", 3.0)]
    df = spark.createDataFrame(rows, "x string, y double")
    row = kendall_tau_b(df, "x", "y").collect()[0]
    codes = {"a": 0, "b": 1, "c": 2}
    xs = np.array([codes[x] for x, _ in rows])
    ys = np.array([y for _, y in rows])
    conc, disc, tau = brute_tau(xs, ys)
    assert (row.conc, row.disc) == (conc, disc)
    assert abs(row.tau_b - np.floor(tau * 1e6) / 1e6) < 1e-12


def test_out_of_domain_x_excluded_consistently(spark):
    """Review r7: rows whose x is outside an explicit x_values must be
    excluded from the WHOLE statistic (n and tie terms included) —
    half-counting them deflated tau silently."""
    rng = np.random.default_rng(5)
    xs = rng.integers(0, 6, 250)
    ys = np.round(rng.normal(size=250), 1)
    domain = [0, 1, 2]  # exclude x in {3,4,5}
    row = kendall_tau_b(
        _mkdf(spark, xs, ys), "x", "y", x_values=domain
    ).collect()[0]
    m = np.isin(xs, domain)
    conc, disc, tau = brute_tau(xs[m], ys[m])
    assert (row.conc, row.disc) == (conc, disc)
    assert abs(row.tau_b - np.floor(tau * 1e6) / 1e6) < 1e-12


def test_nan_domain_raises(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0), (float("nan"), 2.0), (1.0, 3.0)], "x double, y double"
    )
    with pytest.raises(ValueError, match="NaN"):
        kendall_tau_b(df, "x", "y")
    with pytest.raises(ValueError, match="NaN"):
        kendall_tau_b(df, "x", "y", x_values=[0.0, float("nan"), 1.0])


def test_nan_y_excluded_like_null(spark):
    """ADVICE r7: NaN y must not form its own rank cell — it is
    excluded exactly like NULL y, so tau over data with NaN y equals
    tau over the NaN-free subset."""
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 4, 200)
    ys = np.round(rng.normal(size=200), 1)
    ys_nan = ys.copy()
    ys_nan[::7] = np.nan
    row = kendall_tau_b(_mkdf(spark, xs, ys_nan), "x", "y").collect()[0]
    m = ~np.isnan(ys_nan)
    conc, disc, tau = brute_tau(xs[m], ys[m])
    assert (row.conc, row.disc) == (conc, disc)
    assert abs(row.tau_b - np.floor(tau * 1e6) / 1e6) < 1e-12


def test_unsorted_duplicated_x_values_normalized(spark):
    """Review r7: the rank order must be the domain's natural order —
    a caller passing an unsorted or duplicated list gets the same tau
    as the sorted unique domain, not a silently scrambled ranking."""
    rng = np.random.default_rng(9)
    xs = rng.integers(0, 4, 150)
    ys = np.round(rng.normal(size=150), 1)
    a = kendall_tau_b(
        _mkdf(spark, xs, ys), "x", "y", x_values=[3, 0, 2, 1, 0]
    ).collect()[0]
    conc, disc, tau = brute_tau(xs, ys)
    assert (a.conc, a.disc) == (conc, disc)
    assert abs(a.tau_b - np.floor(tau * 1e6) / 1e6) < 1e-12


def test_ols_query_matches_numpy_lstsq(spark):
    """q_agg_ols: the Cramer solve over one moment pass must agree
    with numpy's least-squares fit on the same rows (tolerance covers
    the 4-dp y-moment rounding the cross-engine contract applies)."""
    from clickhub_spark.catalog import load
    from clickhub_spark.plans import all_specs

    sf = "/root/testdata/sf0.001"
    row = all_specs()["q_agg_ols"].builder(spark, sf).collect()[0]
    pdf = (
        load(spark, sf, "events")
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            (F.col("user_id") % 8).cast("long").alias("x1"),
            F.hour("ts").cast("long").alias("x2"),
            F.col("value").alias("y"),
        )
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"].to_numpy(), pdf["x2"].to_numpy()]
    )
    beta, *_ = np.linalg.lstsq(X, pdf["y"].to_numpy(), rcond=None)
    assert row.n == len(pdf)
    assert abs(row.b0 - beta[0]) < 1e-4
    assert abs(row.b1 - beta[1]) < 1e-4
    assert abs(row.b2 - beta[2]) < 1e-4
    yhat = X @ beta
    ss_res = ((pdf["y"].to_numpy() - yhat) ** 2).sum()
    ss_tot = ((pdf["y"].to_numpy() - pdf["y"].mean()) ** 2).sum()
    assert abs(row.r2 - (1 - ss_res / ss_tot)) < 1e-4
