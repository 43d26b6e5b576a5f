"""Similarity search over embeddings (SURVEY §2.J6).

- ``brute_force_topk``: exact cosine top-k against a query vector.
  The query vector is a one-row broadcast; scoring is a codegen'd
  higher-order-function expression over every row, then a global
  top-k (TakeOrderedAndProject — no full sort).  At 100 TB this is
  one full scan per query: correct baseline, not the scale path.

- ``lsh_bucket_topk``: random-hyperplane LSH variant — sign-bit
  signature per vector (deterministic pseudo-random planes derived
  from xxhash64, so no driver-side randomness), candidates share the
  query's bucket (± allowing probing neighbors by Hamming distance 0;
  multi-probe left as a parameter).  The scan is pruned to matching
  buckets via a partition-friendly equality predicate — this is the
  ANN path that survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhub_spark.functions.vectors import as_double, cosine


def _scored(emb: DataFrame, vec_col: str, id_col: str, query: DataFrame) -> DataFrame:
    return (
        emb.crossJoin(F.broadcast(query))
        .withColumn("sim", F.round(cosine(as_double(F.col(vec_col)), F.col("__qvec")), 4))
    )


def brute_force_topk(
    emb: DataFrame, query_id: int, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k neighbors of ``query_id`` (excluded)."""
    query = (
        emb.where(F.col(id_col) == query_id)
        .select(as_double(F.col(vec_col)).alias("__qvec"))
    )
    return (
        _scored(emb.where(F.col(id_col) != query_id), vec_col, id_col, query)
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "sim")
    )


def hyperplane_signature(vec: F.Column, n_bits: int = 16, dim: int = 64) -> F.Column:
    """Deterministic random-hyperplane sign signature.

    Plane p, component i weight = a fixed pseudo-random ±1/±3 value
    derived from xxhash64(p, i) — reproducible across runs/engines
    with no stored model.  Returns an int bucket id in [0, 2^n_bits).
    """
    def bit(p: int) -> F.Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x * ((F.pmod(F.xxhash64(F.lit(p), i), F.lit(7)) - 3).cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))

    sig = F.lit(0)
    for p in range(n_bits):
        sig = sig + bit(p)
    return sig


def ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: KMeans coarse quantizer → scan
    only the query's ``nprobe`` nearest cells.

    The index build (KMeans fit + cell assignment) is a one-time
    distributed job; at query time the scan is pruned to
    nprobe/n_cells of the data — the standard IVF trade-off.  At
    100 TB the cell id becomes the table's partition column so the
    probe is partition pruning, not a filter scan.  Centroids are tiny
    (n_cells × dim) and ship driver-side for the probe selection —
    a parameter lookup, not a data collect.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    qrow = emb.where(F.col(id_col) == query_id).select(vec_col).first()
    if qrow is None:
        # unknown query id: empty result with the output schema, before
        # paying for the index build (mirrors brute_force_topk's
        # graceful empty result)
        return (
            emb.select(id_col)
            .where(F.lit(False))
            .withColumn("sim", F.lit(0.0))
            .withColumn("cell", F.lit(0))
        )
    qvec = np.array(qrow[0], dtype="float64")

    feats = emb.withColumn("__f", array_to_vector(as_double(F.col(vec_col))))
    model = KMeans(k=n_cells, seed=42, featuresCol="__f", predictionCol="__cell").fit(feats)
    assigned = model.transform(feats).drop("__f")

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    probe_cells = [int(c) for c in np.argsort(((centers - qvec) ** 2).sum(1))[:nprobe]]

    query = (
        emb.where(F.col(id_col) == query_id)
        .select(as_double(F.col(vec_col)).alias("__qvec"))
    )
    cand = assigned.where(
        F.col("__cell").isin(probe_cells) & (F.col(id_col) != query_id)
    )
    return (
        _scored(cand, vec_col, id_col, query)
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "sim", F.col("__cell").alias("cell"))
    )


def lsh_bucket_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: score only vectors sharing the query's LSH bucket."""
    dim = 64
    with_sig = emb.withColumn(
        "bucket", hyperplane_signature(as_double(F.col(vec_col)), n_bits, dim)
    )
    query = with_sig.where(F.col(id_col) == query_id).select(
        as_double(F.col(vec_col)).alias("__qvec"), F.col("bucket").alias("__qbucket")
    )
    cand = (
        with_sig.where(F.col(id_col) != query_id)
        .join(F.broadcast(query), F.col("bucket") == F.col("__qbucket"))
        .withColumn("sim", F.round(cosine(as_double(F.col(vec_col)), F.col("__qvec")), 4))
    )
    return (
        cand.orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "sim", "bucket")
    )
