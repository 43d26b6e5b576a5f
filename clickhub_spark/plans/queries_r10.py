"""Round-10 query wave: recall certifications for the two remaining
rows-only ANN paths (VERDICT r9 item 5) — IVF and PQ get the same
driver-checkable treatment q_llm_knn_lsh_recall gave LSH in round 9:
emit the INVARIANT as data (the q_agg_topk_bounds pattern), with the
exact quantities recomputed independently by the oracle and every
bound check a column whose expected value is a constant.

The ANN recall gates are MEASURED margins, not theorems (like the LSH
cert and unlike the topk/uniq/quantile bounds): KMeans-cell and
product-quantization ANN carry no distribution-free recall guarantee;
the gates catch quantizer/probe regressions with headroom over the
observed floor across all three SFs.

The second wave (logreg / PCA / BPE) certifies the model-fitting
rows-only operators with THEOREM invariants — Newton stationarity,
spectral identities, lossless roundtrip — closing the census: every
rows-only query now has either an oracle-green twin or a
driver-checkable certification row.
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
    """Shared exact side of the ANN recall certifications —
    operators/knn.exact_topk_pairs (single-sourced with
    q_llm_knn_lsh_recall's exact side in queries_r9)."""
    from clickhub_spark.operators.knn import exact_topk_pairs

    return exact_topk_pairs(emb, q, k)


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


# --------------------------------------------------------------------------
# Certification rows for the model-fitting rows-only operators (the
# last uncertified entries in the rows-only census): unlike the ANN
# recall gates above, these three emit THEOREM invariants — Newton
# stationarity, eigendecomposition orthonormality / variance identity,
# and BPE's lossless-roundtrip guarantee — so every expected value is
# an exact constant.
# --------------------------------------------------------------------------

#: logreg stationarity tolerance: at the ridge-IRLS fixed point
#: X'(y − p) − λβ = 0 exactly; 8 Newton iterations land the residual
#: at ~1e-13 (measured across SFs) — 1e-6 is a million-fold margin
#: over float summation noise while still certifying convergence.
_GRAD_TOL = 1e-6


@query(
    "q_llm_logreg_cert",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(4 AS INT) AS n_params,
           CAST(0 AS BIGINT) AS viol_grad
    FROM documents
    """,
)
def q_llm_logreg_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationarity certification for the rows-only IRLS logistic fit
    (q_llm_logreg_fit): at the ridge-IRLS fixed point the penalized
    log-likelihood gradient X'(y − σ(Xβ)) − λβ is EXACTLY zero —
    Newton's method converges quadratically, so 8 iterations leave a
    ~1e-13 residual (measured) against the 1e-6 gate.  This is the
    mathematical definition of "the fit is correct" checked at scale:
    the residual is ONE distributed map-side aggregate over the full
    corpus with β broadcast as plan literals (the training pass's own
    shape), so a wrong coefficient, a dropped partition, or a biased
    moment pass all surface as a nonzero gradient.  viol_grad counts
    parameters whose residual exceeds the gate — expected 0, a
    theorem, not a tuned threshold.  The design matrix and the ridge
    λ are IMPORTED from the registered fit's own definitions
    (queries_r7.logreg_features, glm.DEFAULT_RIDGE), so the
    certificate cannot drift from what it certifies."""
    from clickhub_spark.operators.glm import DEFAULT_RIDGE, logistic_fit
    from clickhub_spark.plans.queries_r7 import logreg_features

    feats = ["f_len", "f_words", "f_vowels"]
    docs = logreg_features(load(spark, sf_dir, "documents"))
    beta = logistic_fit(docs, feats, "label")

    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feats]
    eta = sum(float(b) * c for b, c in zip(beta, cols))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    y = F.col("label").cast("double")
    aggs = [
        F.sum((y - p) * c).alias(f"__g{i}") for i, c in enumerate(cols)
    ] + [F.count(F.lit(1)).alias("n_docs")]
    row = docs.agg(*aggs)
    viol = sum(
        (
            F.abs(F.col(f"__g{i}") - F.lit(DEFAULT_RIDGE * beta[i]))
            > _GRAD_TOL
        ).cast("long")
        for i in range(len(cols))
    )
    return row.select(
        "n_docs",
        F.lit(len(cols)).cast("int").alias("n_params"),
        viol.alias("viol_grad"),
    )


#: PCA identity tolerances: eigh returns orthonormal eigenvectors to
#: ~1e-15 and the projection's population variance along component i
#: IS eigenvalue i (measured agreement ~1e-15 relative) — 1e-9 gates
#: both with a million-fold margin.
_PCA_TOL = 1e-9


@query(
    "q_llm_pca_cert",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(8 AS INT) AS k,
           CAST(0 AS BIGINT) AS viol_ortho,
           CAST(0 AS BIGINT) AS viol_order,
           CAST(0 AS BIGINT) AS viol_var
    FROM embeddings
    """,
)
def q_llm_pca_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral-identity certification for the rows-only distributed
    PCA (q_llm_pca, k=8 over the 64-dim embeddings): three theorems of
    a correct eigendecomposition, each expected to hold exactly —

    - viol_ortho: the component matrix is orthonormal (V·V' = I to
      1e-9; eigh guarantees ~1e-15) — checked on the k×d parameter
      matrix the fit returns;
    - viol_order: explained variances are non-increasing;
    - viol_var: the DISTRIBUTED population variance of the projection
      along component i equals eigenvalue i (the spectral identity
      Var(x·vᵢ) = λᵢ) — one map-only Arrow-matmul projection plus one
      16-column aggregate over the full corpus, so a wrong component,
      a stale mean, or a dropped partition shows up as a variance
      mismatch.  This ties the driver-side fit to the data the way
      the logreg gradient check does.

    All three are theorems, not tuned thresholds; the oracle
    recomputes n_vectors and pins the zeros/constants."""
    import numpy as np

    from clickhub_spark.operators.pca import fit_pca, transform_pca

    emb = load(spark, sf_dir, "embeddings")
    mean, comps, evals = fit_pca(emb, "embedding", k=8)
    k = comps.shape[0]

    viol_ortho = int(
        (np.abs(comps @ comps.T - np.eye(k)) > _PCA_TOL).sum()
    )
    viol_order = int(sum(evals[i] < evals[i + 1] for i in range(k - 1)))

    proj = transform_pca(emb, "embedding", mean, comps, ndigits=None)
    aggs = [F.count(F.lit(1)).alias("n_vectors")]
    for i in range(k):
        x = F.col("pca")[i]
        aggs += [F.sum(x).alias(f"__s{i}"), F.sum(x * x).alias(f"__q{i}")]
    row = proj.agg(*aggs)
    n = F.col("n_vectors").cast("double")
    viol_var = sum(
        (
            F.abs(
                (F.col(f"__q{i}") / n - (F.col(f"__s{i}") / n) ** 2)
                - F.lit(float(evals[i]))
            )
            > _PCA_TOL * F.lit(max(float(evals[i]), 1e-12))
        ).cast("long")
        for i in range(k)
    )
    return row.select(
        "n_vectors",
        F.lit(k).cast("int").alias("k"),
        F.lit(viol_ortho).cast("long").alias("viol_ortho"),
        F.lit(viol_order).cast("long").alias("viol_order"),
        viol_var.alias("viol_var"),
    )


@query(
    "q_llm_bpe_cert",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(20 AS INT) AS n_merges,
           CAST(0 AS BIGINT) AS viol_vocab,
           CAST(0 AS BIGINT) AS viol_roundtrip,
           CAST(1 AS INT) AS compressed_le_base
    FROM documents
    """,
)
def q_llm_bpe_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless-roundtrip certification for the rows-only BPE trainer
    (q_llm_bpe_train, 20 merges / 5k-word cap): three guarantees of a
    well-formed byte-pair encoder, all theorems —

    - viol_vocab: every merge combines symbols that exist at its rank
      (single characters, the end-of-word marker, or the output of an
      EARLIER merge) — well-formedness of the learned merge list;
    - viol_roundtrip: decode(encode(text)) == normalized text for
      EVERY document — BPE merges only ever concatenate ADJACENT
      symbols within a word, so the symbol concatenation is a merge
      invariant: "".join(tokens) must equal the word stream with the
      end-of-word marker appended to each word.  Compared as joined
      STRINGS (never by re-splitting on the marker, which would
      miscount legitimate text that itself contains the marker
      sequence); checked distributed (one mapInPandas over the corpus
      with the same Python string semantics the trainer used);
    - compressed_le_base: applying merges never increases the token
      count (each merge application strictly reduces symbols), so the
      corpus token total is bounded by the base char+EOW count.

    The oracle pins the constants and recomputes n_docs."""
    import pandas as pd

    from clickhub_spark.operators.bpe import EOW, _merge_once, train_bpe

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=20, max_words=5000)

    vocab = {EOW}
    viol_vocab = 0
    for left, right in merges:
        for part in (left, right):
            if len(part) > 1 and part != EOW and part not in vocab:
                viol_vocab += 1
        vocab.add(left + right)

    def check(batches, merges=merges):
        for pdf in batches:
            bad, toks, base = 0, 0, 0
            for text in pdf["text"]:
                words = str(text).lower().split()
                out = []
                for w in words:
                    syms = list(w) + [EOW]
                    base += len(syms)
                    for left, right in merges:
                        if len(syms) < 2:
                            break
                        syms = _merge_once(syms, left, right)
                    out.extend(syms)
                toks += len(out)
                # decode: symbol concatenation is invariant under
                # merges — compare the joined strings directly (a
                # split on EOW would break on text that legitimately
                # contains the marker sequence)
                if "".join(out) != "".join(w + EOW for w in words):
                    bad += 1
            yield pd.DataFrame(
                {"n": [len(pdf)], "bad": [bad], "toks": [toks], "base": [base]}
            )

    agg = (
        docs.select("text")
        .mapInPandas(check, "n long, bad long, toks long, base long")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("bad").alias("viol_roundtrip"),
            F.sum("toks").alias("__toks"),
            F.sum("base").alias("__base"),
        )
    )
    return agg.select(
        "n_docs",
        F.lit(len(merges)).cast("int").alias("n_merges"),
        F.lit(viol_vocab).cast("long").alias("viol_vocab"),
        "viol_roundtrip",
        (F.col("__toks") <= F.col("__base")).cast("int").alias(
            "compressed_le_base"
        ),
    )


# --------------------------------------------------------------------------
# windowFunnel mode family (round 10): the operator's remaining three
# engine modes — default-with-window, strict_dedup, strict_increase —
# registered over the same view→click→purchase chain as
# q_funnel_strict / q_funnel_strict_window, so the four modes'
# semantics are directly comparable in driver rows.  Oracles
# transcribe the identical window-SQL construction in DuckDB
# (operators/funnel.py module docstring derives why the greedy DP
# collapses to running maxima).
# --------------------------------------------------------------------------

#: same 1-day window as q_funnel_strict_window (queries_r9).
_FW = 86_400


@query(
    "q_funnel_window",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               substr(event_type, 1, 1) AS i,
               epoch(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id IS NOT NULL
    ), s0 AS (
        SELECT *,
               MAX(CASE WHEN i = 'v' THEN t END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a0
        FROM e
    ), s1 AS (
        SELECT *,
               (i = 'c' AND a0 IS NOT NULL AND t <= a0 + {_FW}) AS qual2
        FROM s0
    ), s2 AS (
        SELECT *,
               MAX(CASE WHEN qual2 THEN a0 END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a1
        FROM s1
    ), lvl AS (
        SELECT user_id,
               CASE WHEN i = 'p' AND a1 IS NOT NULL
                         AND t <= a1 + {_FW} THEN 3
                    WHEN qual2 THEN 2
                    WHEN i = 'v' THEN 1
                    ELSE 0 END AS l
        FROM s2
    ), u AS (
        SELECT user_id, MAX(l) AS level FROM lvl GROUP BY user_id
    )
    SELECT CAST(level AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY level
    """,
)
def q_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel DEFAULT mode with the window bound — ClickHouse
    ``windowFunnel(86400)(ts, type='view', 'click', 'purchase')``:
    non-matching events are ignored (no strict_order abort), the chain
    is a subsequence whose step k lands within one day of the chain
    start inherited through level k-1, chain starts resetting at each
    new 'view'.  The most-used form of the operator; completes the
    mode family next to q_funnel (unbounded chained-min construction,
    an independent derivation of the unbounded case) and
    q_funnel_strict_window.

    Plan: one user_id exchange, one sort, K−1 chained running-max
    window passes, two hash aggregates (operators/funnel.py)."""
    from clickhub_spark.operators.funnel import window_funnel

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ini = F.substring("event_type", 1, 1)
    levels = window_funnel(
        ev,
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
        ts_col="ts",
        window_s=_FW,
    )
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_funnel_strict_dedup",
    oracle="""
    WITH e AS (
        SELECT user_id,
               substr(event_type, 1, 1) AS i,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id IS NOT NULL
    ), s0 AS (
        SELECT *,
               MAX(CASE WHEN i = 'v' THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS ach1
        FROM e
    ), s1 AS (
        SELECT *, (i = 'c' AND ach1 IS NOT NULL) AS qual2 FROM s0
    ), s2 AS (
        SELECT *,
               MAX(CASE WHEN qual2 THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS ach2
        FROM s1
    ), s3 AS (
        SELECT *, (i = 'p' AND ach2 IS NOT NULL) AS qual3 FROM s2
    ), s4 AS (
        SELECT *,
               MAX(CASE WHEN qual3 THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS ach3
        FROM s3
    ), lvl AS (
        SELECT user_id, rn,
               CASE WHEN qual3 THEN 3 WHEN qual2 THEN 2
                    WHEN i = 'v' THEN 1 ELSE 0 END AS l,
               CASE WHEN qual3 THEN rn END AS comp_rn,
               CASE WHEN i = 'c' AND ach2 IS NOT NULL THEN 2
                    WHEN i = 'p' AND ach3 IS NOT NULL THEN 3
                    END AS dup_l
        FROM s4
    ), u AS (
        SELECT user_id,
               CASE WHEN MIN(comp_rn) IS NOT NULL
                         AND (MIN(CASE WHEN dup_l IS NOT NULL
                                       THEN rn END) IS NULL
                              OR MIN(comp_rn) <
                                 MIN(CASE WHEN dup_l IS NOT NULL
                                          THEN rn END))
                    THEN 3
                    ELSE COALESCE(
                        arg_min(dup_l, rn) FILTER (dup_l IS NOT NULL),
                        MAX(l))
                    END AS level
        FROM lvl GROUP BY user_id
    )
    SELECT CAST(level AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY level
    """,
)
def q_funnel_strict_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel strict_dedup mode, unbounded — ClickHouse: a
    condition RE-matching an already-achieved level stops the scan at
    that event and returns ITS level (docs: A->B->B->C stops at the
    second B, level 2); repeated first-step events are exempt (they
    reset the chain start), and a COMPLETED funnel returns
    immediately (the engine's events_size early return), so a
    duplicate after the purchase never lowers the result.  Plan: the
    shared running-max DP plus one min_by for the first duplicate and
    one conditional min for the completion shield
    (operators/funnel.py); the oracle transcribes the identical
    construction with arg_min(...) FILTER."""
    from clickhub_spark.operators.funnel import window_funnel

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ini = F.substring("event_type", 1, 1)
    levels = window_funnel(
        ev,
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
        modes=("strict_dedup",),
    )
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_funnel_strict_increase",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               substr(event_type, 1, 1) AS i,
               epoch(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id IS NOT NULL
    ), s0 AS (
        SELECT *,
               MAX(CASE WHEN i = 'v' THEN t END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a0,
               MAX(CASE WHEN i = 'v' THEN t END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS e0
        FROM e
    ), s1 AS (
        SELECT *,
               (i = 'c' AND a0 IS NOT NULL AND t <= a0 + {_FW}
                AND t > e0) AS qual2
        FROM s0
    ), s2 AS (
        SELECT *,
               MAX(CASE WHEN qual2 THEN a0 END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a1,
               MAX(CASE WHEN qual2 THEN t END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS e1
        FROM s1
    ), lvl AS (
        SELECT user_id,
               CASE WHEN i = 'p' AND a1 IS NOT NULL
                         AND t <= a1 + {_FW} AND t > e1 THEN 3
                    WHEN qual2 THEN 2
                    WHEN i = 'v' THEN 1
                    ELSE 0 END AS l
        FROM s2
    ), u AS (
        SELECT user_id, MAX(l) AS level FROM lvl GROUP BY user_id
    )
    SELECT CAST(level AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY level
    """,
)
def q_funnel_strict_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel strict_increase mode with the 1-day window —
    ClickHouse: step k only advances on a timestamp STRICTLY greater
    than the timestamp of the event that achieved level k-1 (the
    engine's events_timestamp pair's second element), so
    same-timestamp events never chain.  The achieving-event timestamp
    is itself non-decreasing in scan order, so it rides the same
    running-max trick as the chain start — one extra window column
    per level, same single sort (operators/funnel.py)."""
    from clickhub_spark.operators.funnel import window_funnel

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ini = F.substring("event_type", 1, 1)
    levels = window_funnel(
        ev,
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
        ts_col="ts",
        window_s=_FW,
        modes=("strict_increase",),
    )
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# largestTriangleThreeBuckets — ClickHouse's time-series downsampling
# aggregate (operators/lttb.py), plus its full-recurrence certification
# (the greedy selection is verifiable by induction from the output
# alone: endpoints + one-point-per-bucket + per-bucket argmax).
# --------------------------------------------------------------------------

#: downsample target for the registered queries: 20 points per series
#: (sf0.001 series are SHORTER than 20 → pass-through regime also gets
#: driver coverage; sf0.01/0.1 exercise the greedy selection).
_LTTB_N = 20


#: DuckDB transcription of the greedy LTTB recurrence (VERDICT r12
#: item 4): a recursive CTE walks the 18 interior buckets, each step
#: selecting the per-series argmax triangle area against the PREVIOUS
#: selection and the next-bucket average anchor — the same float64
#: expression the numpy fit evaluates, with np.argmax's first-max
#: tie-break transcribed as ORDER BY area DESC, rank ASC.  Bucket
#: membership is the same integer floor formula as bucket_of();
#: pass-through series (n <= 20) bypass the recursion.
_LTTB_EXACT_ORACLE = """
WITH RECURSIVE pts AS (
    SELECT event_type,
           epoch(ts) AS x,
           value AS y,
           ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY epoch(ts), event_id
           ) - 1 AS rank,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL
), bkt AS (
    SELECT event_type, rank, x, y, n,
           CASE WHEN rank = 0 THEN -1
                WHEN rank = n - 1 THEN 19
                ELSE CAST(((rank - 1) * 18) // (n - 2) AS INT)
           END AS b
    FROM pts WHERE n > 20
), anchors AS (
    SELECT event_type, b - 1 AS b, AVG(x) AS ax, AVG(y) AS ay
    FROM bkt WHERE b BETWEEN 1 AND 17
    GROUP BY event_type, b
    UNION ALL
    SELECT event_type, 17 AS b, x AS ax, y AS ay
    FROM bkt WHERE rank = n - 1
), sel AS (
    SELECT event_type, -1 AS b, rank, x, y
    FROM bkt WHERE rank = 0
    UNION ALL
    SELECT event_type, b, rank, x, y FROM (
        SELECT p.event_type, p.b, p.rank, p.x, p.y,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_type
                   ORDER BY abs((s.x - a.ax) * (p.y - s.y)
                               - (s.x - p.x) * (a.ay - s.y)) DESC,
                            p.rank ASC
               ) AS rn
        FROM sel s
        JOIN bkt p ON p.event_type = s.event_type AND p.b = s.b + 1
        JOIN anchors a ON a.event_type = s.event_type AND a.b = s.b + 1
        WHERE s.b < 17
    ) c WHERE rn = 1
)
SELECT event_type,
       CAST(b AS INT) AS bucket,
       CAST(rank AS BIGINT) AS rank,
       floor(x * 1000000) / 1000000 AS x,
       floor(y * 10000) / 10000 AS y
FROM (
    SELECT event_type, b, rank, x, y FROM sel
    UNION ALL
    SELECT event_type, 19 AS b, rank, x, y FROM bkt WHERE rank = n - 1
    UNION ALL
    SELECT event_type, rank AS b, rank, x, y FROM pts WHERE n <= 20
)
ORDER BY event_type, rank
"""


@query("q_agg_lttb_exact", oracle=_LTTB_EXACT_ORACLE)
def q_agg_lttb_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets(20)(ts, value)`` per
    event_type — the EXACT sequential form (Steinarsson's greedy:
    each bucket's pick anchors on the previously SELECTED point),
    which is what the engine's aggregate computes inside its sorted
    state; q_agg_lttb (queries_r5c) keeps the parallel
    neighbor-centroid approximation for the pure-SQL shape.
    Value-oracled since r13: the oracle replays the greedy
    recurrence as a DuckDB recursive CTE (bit-identical float64
    arithmetic; verified hash-match at sf0.001/0.01/0.1);
    q_agg_lttb_cert additionally re-verifies the recurrence
    distributed, and tests/test_lttb.py pins a single-process
    reference sweep.
    Plan: one applyInPandas per series (per-series state = that
    series' points, the engine's own aggregate posture; the scale
    axis is series count)."""
    from clickhub_spark.operators.lttb import lttb

    # Match lttb()'s NULL contract exactly: rows with NULL x (ts) OR
    # NULL y (value) have no position on the plane and are dropped.
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    out = lttb(
        ev, "event_type", "ts", "value", _LTTB_N, order_cols=["event_id"]
    )
    return out.select(
        "event_type",
        "bucket",
        "rank",
        (F.floor(F.col("x") * 1000000) / 1000000).alias("x"),
        (F.floor(F.col("y") * 10000) / 10000).alias("y"),
    ).orderBy("event_type", "rank")


@query(
    "q_agg_lttb_cert",
    oracle=f"""
    WITH s AS (
        SELECT event_type, COUNT(*) AS cnt FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY event_type
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_series,
           CAST(SUM(cnt) AS BIGINT) AS n_points,
           CAST(SUM(LEAST(cnt, {_LTTB_N})) AS BIGINT) AS n_selected,
           CAST(0 AS BIGINT) AS viol_points,
           CAST(0 AS BIGINT) AS viol_bucket,
           CAST(0 AS BIGINT) AS viol_argmax
    FROM s
    """,
)
def q_agg_lttb_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-recurrence certification for the rows-only exact LTTB
    downsampler (q_agg_lttb_exact): the greedy algorithm is
    characterized by
    three checkable properties, verified DISTRIBUTED against the raw
    series —

    - viol_points: every selected rank exists in its series with
      matching (x, y) and sits in its recomputed bucket (bucket_of's
      integer arithmetic; endpoints are ranks 0 and n-1 by the same
      formula; pass-through series must re-emit every rank);
    - viol_bucket: per full-length series, exactly n_out selections
      across n_out distinct buckets; per short series, all n points;
    - viol_argmax: for every interior bucket, the selected point
      maximizes the triangle area against the PREVIOUS selection and
      the NEXT-bucket average anchor — the greedy recurrence itself;
      with endpoints and buckets pinned, induction over buckets makes
      this a complete verification of the algorithm (the
      q_llm_logreg_cert posture).  Area comparison carries a 1e-9
      relative slack: the fit's numpy anchor means and the JVM's avg
      can differ in the last ulp.

    The oracle recomputes n_series / n_points / n_selected exactly
    and pins the violation zeros.

    r17 restructure (guide §1.2 order 1 — fix the distributed
    algorithm before anything else; resolves VERDICT r16 item 4): the
    r15/r16 shape expressed the three checks as SIX dataflow branches
    over two shared subtrees (pts = sort-window pass over events, sel
    = the applyInPandas fit), each branch re-executing its subtree —
    16 FlatMapGroupsInPandas nodes, 20+ Exchanges; the r16
    repartition-for-AQE-reuse band-aid never produced a
    ReusedExchange (column pruning pushes branch-specific Projects
    below the repartition, so no two exchanges are canonically equal)
    and is removed.  The checks are per-series by construction, so
    the whole verification is ONE cogrouped pandas pass: raw points
    cogroup the fit output on the series key, each group re-derives
    ranks/buckets with the same integer arithmetic (bucket_of) and
    numpy float64 area formula, and emits one row of per-series
    counts; a single global aggregate finishes.  Plan: 2 shuffles + 2
    Python passes (fit + verify) instead of 6 subtree re-executions.
    Violation semantics are replicated check-for-check from the
    relational form (left-join point match incl. the NULL-px clause,
    per-series count/coverage, per-selected-row argmax with the same
    1e-9 relative slack); output values identical on any input where
    the fit is correct — pinned by the oracle at all three SFs."""
    import numpy as np
    import pandas as pd

    from clickhub_spark.operators.lttb import lttb

    n_out = _LTTB_N
    nb = n_out - 2
    # pts must mirror lttb()'s NULL-drop contract (NULL ts OR value)
    # or ranks misalign and the cert reports spurious violations.
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    pts = ev.select(
        "event_type",
        F.col("ts").cast("double").alias("x"),
        F.col("value").cast("double").alias("y"),
        "event_id",
    )
    sel = lttb(
        ev, "event_type", "ts", "value", n_out, order_cols=["event_id"]
    )

    def verify(pts_pdf: pd.DataFrame, sel_pdf: pd.DataFrame) -> pd.DataFrame:
        p = pts_pdf.sort_values(["x", "event_id"], kind="mergesort")
        x = p["x"].to_numpy(dtype="float64")
        y = p["y"].to_numpy(dtype="float64")
        n = len(x)
        full = n > n_out
        # bucket_of, same arithmetic: floor of the float64 division
        ranks = np.arange(n, dtype="int64")
        interior = np.floor(
            (ranks - 1) * (n_out - 2) / max(n - 2, 1)
        ).astype("int64")
        pb = np.where(
            ranks == 0, -1, np.where(ranks == n - 1, n_out - 1, interior)
        ).astype("int64")

        sr = sel_pdf["rank"].to_numpy(dtype="int64")
        sb = sel_pdf["bucket"].to_numpy(dtype="int64")
        sx = sel_pdf["x"].to_numpy(dtype="float64")
        sy = sel_pdf["y"].to_numpy(dtype="float64")
        m = len(sr)

        # --- selected rows exist, match, and sit in their buckets ---
        valid = (sr >= 0) & (sr < n)
        ri = np.clip(sr, 0, max(n - 1, 0))
        exp_bucket = pb[ri] if full else sr
        bad_point = (
            ~valid
            | (x[ri] != sx)
            | (y[ri] != sy)
            | (sb != exp_bucket)
        )
        viol_points = int(bad_point.sum())

        # --- per-series selection count / bucket coverage ---
        bad_series = (m != min(n, n_out)) or (
            full and len(np.unique(sb)) != n_out
        )
        viol_bucket = int(bad_series)

        # --- the greedy recurrence: per-bucket argmax ---
        viol_argmax = 0
        if full:
            by_bucket = {int(b): i for i, b in enumerate(sb)}
            for b in range(nb):
                # prev selection = the bucket-(b-1) pick (bucket -1 is
                # the first point); next anchor = bucket-(b+1) average,
                # or the final point for the last interior bucket
                pi = by_bucket.get(b - 1)
                if pi is None:
                    continue  # inner join in the relational form
                ax, ay = sx[pi], sy[pi]
                if b + 1 < nb:
                    nxt = pb == b + 1
                    if not nxt.any():
                        continue
                    cx, cy = x[nxt].mean(), y[nxt].mean()
                else:
                    li = by_bucket.get(n_out - 1)
                    if li is None:
                        continue
                    cx, cy = sx[li], sy[li]
                cm = pb == b
                if not cm.any():
                    continue
                maxa = np.abs(
                    (ax - cx) * (y[cm] - ay) - (ax - x[cm]) * (cy - ay)
                ).max()
                for i in np.flatnonzero(sb == b):
                    sela = abs(
                        (ax - cx) * (sy[i] - ay) - (ax - sx[i]) * (cy - ay)
                    )
                    if (maxa - sela) > 1e-9 * max(maxa, 1.0):
                        viol_argmax += 1

        return pd.DataFrame(
            {
                "n_points": [n],
                "n_selected": [m],
                "viol_points": [viol_points],
                "viol_bucket": [viol_bucket],
                "viol_argmax": [viol_argmax],
            }
        )

    per_series = (
        pts.groupBy("event_type")
        .cogroup(sel.groupBy("event_type"))
        .applyInPandas(
            verify,
            "n_points long, n_selected long, viol_points long, "
            "viol_bucket long, viol_argmax long",
        )
    )
    return per_series.agg(
        F.count(F.lit(1)).alias("n_series"),
        F.coalesce(F.sum("n_points"), F.lit(0)).alias("n_points"),
        F.coalesce(F.sum("n_selected"), F.lit(0)).alias("n_selected"),
        F.coalesce(F.sum("viol_points"), F.lit(0)).alias("viol_points"),
        F.coalesce(F.sum("viol_bucket"), F.lit(0)).alias("viol_bucket"),
        F.coalesce(F.sum("viol_argmax"), F.lit(0)).alias("viol_argmax"),
    )
