"""Round-10 query wave: recall certifications for the two remaining
rows-only ANN paths (VERDICT r9 item 5) — IVF and PQ get the same
driver-checkable treatment q_llm_knn_lsh_recall gave LSH in round 9:
emit the INVARIANT as data (the q_agg_topk_bounds pattern), with the
exact quantities recomputed independently by the oracle and every
bound check a column whose expected value is a constant.

Both gates are MEASURED margins, not theorems (like the LSH cert and
unlike the topk/uniq/quantile bounds): KMeans-cell and
product-quantization ANN carry no distribution-free recall guarantee;
the gates catch quantizer/probe regressions with headroom over the
observed floor across all three SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query

#: certification geometry shared with q_llm_knn_lsh_recall: mean
#: recall over the first 20 query vectors, so the flag is stable
#: across SFs.
_NQ = 20

#: IVF serving configuration being certified (q_llm_knn_ivf:
#: n_cells=16, nprobe=4, k=10).  Measured recall@10: 0.645 / 0.710 /
#: 0.600 at sf0.001/0.01/0.1 — gate 0.50 (~17% headroom under the
#: floor); measured candidate fraction 0.29-0.34 — gate 0.50.
_IVF_CELLS, _IVF_NPROBE, _IVF_K = 16, 4, 10

#: PQ serving configuration being certified (q_llm_knn_pq: m=16
#: subspaces, 32 codes, k=20).  Measured recall@20: 0.552 / 0.583 /
#: 0.438 — gate 0.35 (~20% headroom under the floor).
_PQ_M, _PQ_CODES, _PQ_K = 16, 32, 20


def _exact_pairs(emb: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Exact cosine top-k per query — the deliberate O(n·q) cross
    score (q=20: certification cost, not the serving path), identical
    to q_llm_knn_lsh_recall's exact side."""
    from clickhub_spark.operators.knn import cosine

    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .withColumn("sim", cosine(F.col("v"), F.col("qv")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vec_id")
    )


@query(
    "q_llm_knn_ivf_recall",
    oracle=f"""
    WITH t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors FROM embeddings
    ), q AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries
        FROM embeddings WHERE vec_id < {_NQ}
    )
    SELECT t.n_vectors, q.n_queries,
           CAST(q.n_queries * LEAST({_IVF_K}, t.n_vectors - 1) AS BIGINT)
               AS n_exact_pairs,
           CAST(q.n_queries * {_IVF_NPROBE} AS BIGINT) AS probe_pairs,
           CAST(1 AS INT) AS recall_ge_050,
           CAST(1 AS INT) AS pruned_le_050
    FROM t, q
    """,
)
def q_llm_knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall certification for the rows-only IVF ANN path
    (q_llm_knn_ivf): mean top-10 recall over 20 query vectors against
    the exact cosine top-10, as a driver-checkable boolean, plus the
    structural pruning claims — every query probes EXACTLY nprobe of
    the n_cells index partitions (probe_pairs = 20·4, an arithmetic
    constant: the centroid table always holds n_cells rows), and the
    probed cells together hold at most half the corpus (measured
    0.29-0.34).

    The certified configuration is the registered serving path's own
    build-once index artifact (n_cells=16, nprobe=4 — rebuilt here
    only if absent, exactly as ivf_topk serves): centroid ranking is
    a 20×16 broadcast cross score, candidates come from a broadcast
    join of (qid, cell) probes against the cell-partitioned index,
    and both top-k sides are rank windows.  Recall gate 0.50 is a
    MEASURED margin (floor 0.600 across SFs), not a theorem."""
    import os

    from clickhub_spark.artifacts import derived_artifact_path
    from clickhub_spark.operators.knn import (
        as_double,
        build_ivf_index,
        cosine,
    )

    raw = load(spark, sf_dir, "embeddings")
    path = derived_artifact_path(raw, f"ivf{_IVF_CELLS}")
    if not os.path.isdir(path + "/data"):
        from clickhub_spark.artifacts import prune_stale

        build_ivf_index(raw, path, _IVF_CELLS)
        prune_stale(path)

    emb = raw.select("vec_id", as_double(F.col("embedding")).alias("v"))
    q = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )

    # nprobe nearest cells per query: 20×16 broadcast cross score on
    # the centroid parameter table (the driver-side argmin in
    # ivf_probe_topk, expressed as one plan)
    cents = spark.read.parquet(path + "/centroids")
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    wp = Window.partitionBy("qid").orderBy(
        F.col("d2").asc(), F.col("cell").asc()
    )
    probe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _IVF_NPROBE)
        .select("qid", "cell", "qv")
    )

    data = spark.read.parquet(path + "/data").select(
        "vec_id", as_double(F.col("embedding")).alias("cv"), "cell"
    )
    cand = data.join(F.broadcast(probe), "cell").where(
        F.col("vec_id") != F.col("qid")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    ann = (
        cand.withColumn("sim", cosine(F.col("cv"), F.col("qv")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _IVF_K)
        .select("qid", "vec_id")
    )
    exact = _exact_pairs(emb, q, _IVF_K)

    counts = (
        emb.agg(F.count(F.lit(1)).alias("n_vectors"))
        .crossJoin(q.agg(F.count(F.lit(1)).alias("n_queries")))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact_pairs")))
        .crossJoin(
            exact.join(ann, ["qid", "vec_id"]).agg(
                F.count(F.lit(1)).alias("__hits")
            )
        )
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("__cand")))
        .crossJoin(
            probe.agg(F.count(F.lit(1)).alias("probe_pairs"))
        )
    )
    return counts.select(
        "n_vectors",
        "n_queries",
        "n_exact_pairs",
        "probe_pairs",
        (F.col("__hits") >= 0.50 * F.col("n_exact_pairs"))
        .cast("int")
        .alias("recall_ge_050"),
        (
            F.col("__cand")
            <= 0.50 * F.col("n_queries") * (F.col("n_vectors") - 1)
        )
        .cast("int")
        .alias("pruned_le_050"),
    )


@query(
    "q_llm_knn_pq_recall",
    oracle=f"""
    WITH t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors FROM embeddings
    ), q AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries
        FROM embeddings WHERE vec_id < {_NQ}
    )
    SELECT t.n_vectors, q.n_queries,
           CAST(q.n_queries * LEAST({_PQ_K}, t.n_vectors - 1) AS BIGINT)
               AS n_exact_pairs,
           t.n_vectors AS code_rows,
           CAST(0 AS BIGINT) AS bad_codes,
           CAST(1 AS INT) AS recall_ge_035
    FROM t, q
    """,
)
def q_llm_knn_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall certification for the rows-only PQ ANN path
    (q_llm_knn_pq): mean top-20 recall over 20 query vectors against
    the exact cosine top-20 as a driver-checkable boolean, plus the
    index-integrity theorems — the codes table covers the corpus
    exactly (code_rows = n_vectors; the oracle recomputes the corpus
    count) and every code is a length-m array of valid codebook
    entries (bad_codes = 0).

    The certified configuration is the registered serving path's own
    build-once artifact (m=16, n_codes=32 — rebuilt only if absent,
    exactly as pq_topk serves).  The 20 query vectors and the
    m×n_codes codebook are bounded parameter fetches (the same
    posture as ivf_probe_topk's centroid read); the asymmetric-
    distance scan is ONE vectorized mapInPandas over the codes table
    emitting all 20 queries' sims per Arrow batch — the serving
    path's own ADC arithmetic (sim = 1 − L2²/2 on build-normalized
    vectors, rounded to 4dp like pq_probe_topk).  Recall gate 0.35 is
    a MEASURED margin (floor 0.438 across SFs), not a theorem."""
    import os

    import numpy as np
    import pandas as pd

    from clickhub_spark.artifacts import derived_artifact_path
    from clickhub_spark.operators.knn import as_double, build_pq_index

    raw = load(spark, sf_dir, "embeddings")
    path = derived_artifact_path(raw, f"pq{_PQ_M}x{_PQ_CODES}")
    if not os.path.isdir(path + "/codes"):
        from clickhub_spark.artifacts import prune_stale

        build_pq_index(raw, path, _PQ_M, _PQ_CODES)
        prune_stale(path)

    emb = raw.select("vec_id", as_double(F.col("embedding")).alias("v"))
    q = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )

    # parameter fetches: m×n_codes codebook + the 20 query vectors
    cb = spark.read.parquet(path + "/codebooks").collect()
    m = 1 + max(r.sub for r in cb)
    n_codes = 1 + max(r.code for r in cb)
    d = len(cb[0].centroid)
    books = np.empty((m, n_codes, d))
    for r in cb:
        books[r.sub, r.code] = r.centroid
    qrows = q.collect()
    qids = np.asarray([r.qid for r in qrows])
    Q = np.asarray([r.qv for r in qrows], dtype="float64")
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # per-query ADC lookup tables: nq × m × n_codes
    tables = np.stack(
        [
            ((Q[:, None, s * d : (s + 1) * d] - books[s][None, :, :]) ** 2).sum(-1)
            for s in range(m)
        ],
        axis=1,
    )

    def adc(batches):
        sub_idx = np.arange(m)[None, :]
        for pdf in batches:
            codes = np.asarray(list(pdf["code"]), dtype="int64")
            out = []
            for qi in range(len(qids)):
                dist2 = tables[qi][sub_idx, codes].sum(-1)
                out.append(
                    pd.DataFrame(
                        {
                            "qid": qids[qi],
                            "vid": pdf["vid"],
                            "sim": np.round(1.0 - dist2 / 2.0, 4),
                        }
                    )
                )
            yield pd.concat(out)

    codes = spark.read.parquet(path + "/codes")
    sims = codes.mapInPandas(adc, "qid long, vid long, sim double").where(
        F.col("vid") != F.col("qid")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vid").asc()
    )
    ann = (
        sims.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _PQ_K)
        .select("qid", F.col("vid").alias("vec_id"))
    )
    exact = _exact_pairs(emb, q, _PQ_K)

    bad = (F.size("code") != m) | F.exists(
        "code", lambda x: (x < 0) | (x >= n_codes)
    )
    counts = (
        emb.agg(F.count(F.lit(1)).alias("n_vectors"))
        .crossJoin(q.agg(F.count(F.lit(1)).alias("n_queries")))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact_pairs")))
        .crossJoin(
            exact.join(ann, ["qid", "vec_id"]).agg(
                F.count(F.lit(1)).alias("__hits")
            )
        )
        .crossJoin(
            codes.agg(
                F.count(F.lit(1)).alias("code_rows"),
                F.sum(bad.cast("long")).alias("bad_codes"),
            )
        )
    )
    return counts.select(
        "n_vectors",
        "n_queries",
        "n_exact_pairs",
        "code_rows",
        "bad_codes",
        (F.col("__hits") >= 0.35 * F.col("n_exact_pairs"))
        .cast("int")
        .alias("recall_ge_035"),
    )
