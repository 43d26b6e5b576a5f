"""Distributed PCA (operators/pca.py): the one-pass moment fit must
equal a single-node numpy PCA, components must be orthonormal with
descending variance, and the projection must preserve neighborhood
structure (the property ANN-in-reduced-space relies on)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhub_spark.operators.pca import fit_pca, transform_pca
from tests.conftest import SF_DIR

K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def fitted(spark, emb):
    return fit_pca(emb, "embedding", K)


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_distributed_fit_equals_numpy_fit(emb, fitted):
    x = np.stack([r.embedding for r in emb.orderBy("vec_id").collect()]).astype(
        np.float64
    )
    mean_np, comps_np, evals_np = _numpy_pca(x, K)
    mean, comps, evals = fitted
    np.testing.assert_allclose(mean, mean_np, atol=1e-9)
    np.testing.assert_allclose(evals, evals_np, atol=1e-9)
    np.testing.assert_allclose(comps, comps_np, atol=1e-7)


def test_fit_is_partition_invariant(emb, fitted):
    mean1, comps1, _ = fitted
    mean8, comps8, _ = fit_pca(emb.repartition(8), "embedding", K)
    np.testing.assert_allclose(mean1, mean8, atol=1e-9)
    np.testing.assert_allclose(comps1, comps8, atol=1e-7)


def test_components_orthonormal_variance_descending(fitted):
    _, comps, evals = fitted
    np.testing.assert_allclose(comps @ comps.T, np.eye(K), atol=1e-9)
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(K - 1))
    assert evals[-1] >= 0


def test_transform_matches_closed_form(emb, fitted):
    mean, comps, _ = fitted
    rows = (
        transform_pca(emb, "embedding", mean, comps, ndigits=None)
        .orderBy("vec_id")
        .collect()
    )
    x = np.stack([r.embedding for r in rows]).astype(np.float64)
    y = np.stack([r.pca for r in rows])
    np.testing.assert_allclose(y, (x - mean) @ comps.T, atol=1e-9)


def test_reduced_space_preserves_neighbors(emb, fitted):
    # the fixture embeddings are NEARLY isotropic (top-8 axes carry
    # ~20% of variance vs 12.5% for a flat spectrum), so absolute
    # recall is structurally low; the sound property is RELATIVE:
    # top-8 principal axes must (a) carry more than the flat-spectrum
    # variance share and (b) beat the bottom-8 axes at preserving
    # kNN structure.
    x = np.stack([r.embedding for r in emb.orderBy("vec_id").collect()]).astype(
        np.float64
    )
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    assert evals[order][:K].sum() / evals.sum() > K / x.shape[1]
    top = (x - mean) @ evecs[:, order[:K]]
    bot = (x - mean) @ evecs[:, order[-K:]]
    # the distributed transform must agree with the top-axes projection
    _, comps, _ = fitted
    rows = (
        transform_pca(emb, "embedding", *fitted[:2], ndigits=None)
        .orderBy("vec_id")
        .collect()
    )
    y = np.stack([r.pca for r in rows])
    np.testing.assert_allclose(np.abs(y), np.abs(top), atol=1e-6)

    def top10(m):
        d = ((m[:, None, :] - m[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return np.argsort(d, axis=1)[:, :10]

    sub = slice(0, 120)  # keep the O(n^2) check small
    full = top10(x[sub])

    def recall(m):
        red = top10(m[sub])
        return np.mean(
            [len(set(full[i]) & set(red[i])) / 10 for i in range(full.shape[0])]
        )
    assert recall(top) > recall(bot) + 0.05, (recall(top), recall(bot))


def test_registered_query_shape(spark):
    from clickhub_spark.plans import all_specs

    df = all_specs()["q_llm_pca"].builder(spark, SF_DIR)
    rows = df.limit(5).collect()
    assert len(rows) == 5
    # pca8 is a CSV string (scalar wire form — the driver canon
    # cannot sort array cells): K decimal components per row
    assert all(isinstance(r.pca8, str) for r in rows)
    assert all(len(r.pca8.split(",")) == K for r in rows)


def test_empty_input_raises(spark, emb):
    with pytest.raises(ValueError):
        fit_pca(emb.where(F.lit(False)), "embedding", K)
