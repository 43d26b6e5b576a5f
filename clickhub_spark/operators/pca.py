"""Distributed PCA over embedding columns.

The dimensionality-reduction preprocessing step a training-data
pipeline runs before ANN indexing / clustering at scale: project
d-dim embeddings onto the top-k principal axes, shrinking every
downstream index and distance computation by d/k while keeping most
variance.

Scale shape (the only part that matters at 100 TB): the fit is ONE
pass of map-side partial moments — each partition accumulates
(count, Σx, ΣxxT) into a d(d+1)-float state via numpy, one tiny
reduce task combines P partials, and the d×d eigendecomposition runs
on the driver (d is the embedding width, 64-4096; dd doubles fit in
memory at any realistic d — a 4096-dim Gram is 128 MiB).  The data is
NEVER shuffled and never seen twice; transform is a map-only Arrow
matmul against the broadcast (k×d) component matrix.  This mirrors
the IVF-centroid contract in knn.py: bounded parameter state on the
driver, map-only application.

Determinism: eigenvectors are sign-ambiguous; we fix each component's
sign so its largest-|coordinate| entry is positive, making fit →
transform reproducible run-to-run (unit-pinned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(df: DataFrame, vec_col: str, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-pass moment accumulation + driver-side eigh.

    Returns (mean[d], components[k, d], explained_variance[k]) with
    components ordered by descending eigenvalue.
    """

    def partial(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x if g is None else g + x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tobytes()], "g": [g.tobytes()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partial, "n BIGINT, s BINARY, g BINARY")
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.frombuffer(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.frombuffer(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def transform_pca(
    df: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    out_col: str = "pca",
    ndigits: int | None = 6,
) -> DataFrame:
    """Map-only projection: (x - mean) @ components.T per Arrow batch.
    ``ndigits`` rounds the output coordinates (None keeps full
    precision)."""
    m = np.asarray(mean, dtype=np.float64)
    c = np.asarray(components, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        x = np.stack(vs.to_numpy()).astype(np.float64)
        y = (x - m) @ c.T
        if ndigits is not None:
            y = np.round(y, ndigits)
        return pd.Series(list(y))

    return df.withColumn(out_col, project(F.col(vec_col)))
