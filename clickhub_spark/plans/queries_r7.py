"""Round-7 query wave.

New surface this round targets the LLM-pipeline gaps a web-corpus
curator hits next: passage-frequency deduplication (the
RefinedWeb/CCNet technique — a document is suspect when most of its
PASSAGES occur verbatim elsewhere, even though no single pair of
documents matches) and the string-distance function family
(ClickHouse editDistance / damerauLevenshteinDistance analogs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query

#: words per non-overlapping passage window (RefinedWeb uses larger
#: spans on real prose; 3 keeps measurable cross-doc collision rates
#: on the synthetic word-soup corpus at every test SF)
_PASSAGE_W = 3


@query(
    "q_llm_dedup_passage",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), p AS (
        SELECT doc_id,
               array_to_string(ws[(i * {_PASSAGE_W} + 1):(i * {_PASSAGE_W} + {_PASSAGE_W})], ' ')
                   AS passage
        FROM w, UNNEST(range(0, CAST(FLOOR(len(ws) / {_PASSAGE_W}) AS BIGINT))) t(i)
        WHERE len(ws) >= {_PASSAGE_W}
    ), h AS (
        SELECT doc_id, md5(passage) AS ph FROM p
    ), d AS (
        SELECT ph, COUNT(DISTINCT doc_id) AS nd FROM h GROUP BY ph
    ), agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_passages,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM h JOIN d USING (ph) GROUP BY doc_id
    )
    SELECT doc_id, n_passages, n_dup,
           FLOOR(CAST(n_dup AS DOUBLE) / n_passages * 10000) / 10000 AS dup_frac,
           (CAST(n_dup AS DOUBLE) / n_passages) >= 0.5 AS flagged
    FROM agg ORDER BY doc_id
    """,
)
def q_llm_dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-frequency deduplication (the RefinedWeb / CCNet
    corpus-curation technique; complements q_llm_dedup_substring's
    pairwise longest-run form): split each document into
    non-overlapping W-word passages, count the DISTINCT documents
    containing each passage hash, and flag documents where ≥50% of
    passages occur verbatim in some other document — boilerplate-heavy
    pages that no single-pair comparison catches.

    100 TB shape: one shuffle keyed by passage hash (the frequency
    aggregate — map-side combine collapses repeats per partition),
    one join back keyed the same way, one doc-keyed aggregate.  No
    pairwise anything: cost is linear in corpus passages, and the
    passage-hash key space is huge so the shuffle cannot skew.
    dup_frac is FLOOR-scaled (not ROUND): ratios of small integers
    land exactly on decimal halves (3/32 = .09375) where the engines'
    ROUND modes diverge.  Implementation:
    operators/textops.passage_dup_stats (shared with the 100× scale
    smoke, tools/smoke_passage_dedup.py)."""
    from clickhub_spark.operators.textops import passage_dup_stats

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return passage_dup_stats(docs, "text", "doc_id", w=_PASSAGE_W).orderBy(
        "doc_id"
    )


@query(
    "q_fn_editdistance",
    oracle="""
    WITH pairs AS (
        SELECT d.doc_id,
               substr(d.text, 1, 24) AS a,
               substr(d2.text, 1, 24) AS b
        FROM documents d
        JOIN documents d2 ON d2.doc_id = d.doc_id + 1
    )
    SELECT doc_id,
           CAST(levenshtein(a, b) AS INT) AS edit_dist,
           CAST(CASE WHEN levenshtein(a, b) > 8 THEN -1
                     ELSE levenshtein(a, b) END AS INT) AS edit_dist_capped,
           FLOOR((1.0 - CAST(levenshtein(a, b) AS DOUBLE) /
                  GREATEST(len(a), len(b), 1)) * 10000) / 10000 AS sim_norm
    FROM pairs ORDER BY doc_id
    """,
)
def q_fn_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance function family (ClickHouse editDistance /
    editDistanceUTF8 — SURVEY §2.G1 extension; the scoring primitive
    under q_llm_dedup_editdist's blocked near-dup join): Levenshtein
    distance between each document's 24-char prefix and its
    successor's, plain + threshold-capped (Spark's 3-arg levenshtein
    returns -1 above the bound without finishing the DP table — the
    form to use inside a candidate-pair filter, where most pairs blow
    the bound early) + a normalized similarity.  The self-join on
    doc_id+1 is a co-partitioned merge of a presorted key — at scale
    both sides shuffle once on the same key.  FLOOR-scaled similarity
    (exact decimal halves diverge under ROUND)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 24).alias("a")
    )
    d2 = d.select((F.col("doc_id") - 1).alias("doc_id"), F.col("a").alias("b"))
    pairs = d.join(d2, "doc_id")
    lev = F.levenshtein("a", "b")
    # GREATEST(..., 1): two empty strings would otherwise divide 0/0,
    # which non-ANSI Spark renders NULL but DuckDB renders NaN — the
    # guard keeps the contract independent of data shape (ADVICE r7)
    sim = (
        F.lit(1.0)
        - lev.cast("double")
        / F.greatest(F.length("a"), F.length("b"), F.lit(1))
    )
    return pairs.select(
        "doc_id",
        lev.alias("edit_dist"),
        F.levenshtein("a", "b", 8).alias("edit_dist_capped"),
        (F.floor(sim * 10000) / 10000).alias("sim_norm"),
    ).orderBy("doc_id")


@query(
    "q_agg_ols",
    oracle="""
    WITH p AS (
        SELECT CAST(user_id % 8 AS BIGINT) AS x1,
               CAST(hour(ts) AS BIGINT) AS x2,
               value AS y
        FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ), m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x1) AS DOUBLE) AS s1,
               CAST(SUM(x2) AS DOUBLE) AS s2,
               CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
               CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
               CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
               ROUND(SUM(y), 4) AS sy,
               ROUND(SUM(x1 * y), 4) AS s1y,
               ROUND(SUM(x2 * y), 4) AS s2y,
               ROUND(SUM(y * y), 4) AS syy
        FROM p
    ), d AS (
        SELECT *,
               (n * (s11 * s22 - s12 * s12)
                - s1 * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s12 - s11 * s2)) AS det,
               (sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y)) AS det0,
               (n * (s1y * s22 - s12 * s2y)
                - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2)) AS det1,
               (n * (s11 * s2y - s1y * s12)
                - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2)) AS det2
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(det0 / det * 1000000) / 1000000 AS b0,
           FLOOR(det1 / det * 1000000) / 1000000 AS b1,
           FLOOR(det2 / det * 1000000) / 1000000 AS b2,
           FLOOR((1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                         - (det2 / det) * s2y)
                        / (syy - sy * sy / n)) * 1000000) / 1000000 AS r2
    FROM d
    """,
)
def q_agg_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression by normal equations (ClickHouse
    simpleLinearRegression generalized to 2 features + intercept; the
    closed-form answer stochasticLinearRegression iterates toward —
    SURVEY §2.D13 extension): fit value ~ user-bucket + hour-of-day in
    ONE map-side moment pass.  The 3×3 Gram matrix and moment vector
    are nine mergeable sums (partial+final aggregate, the same shape
    as SUM — at 100 TB the corpus is read once and never shuffled:
    the only exchange carries one row of partials per partition);
    Cramer's rule solves the system in plain expressions on the
    single-row result.

    Cross-engine determinism: the X-moments are exact integers (the
    features are integer buckets); the y-moments are ROUNDed to 4 dp
    on both sides; every subsequent operation is the IDENTICAL
    double-arithmetic formula with the identical parenthesization, so
    both engines walk the same IEEE ops to the same bits —
    FLOOR-scaling the outputs is then safe.  R² from the same
    moments."""
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            (F.col("user_id") % 8).cast("long").alias("x1"),
            F.hour("ts").cast("long").alias("x2"),
            F.col("value").alias("y"),
        )
    )
    m = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.round(F.sum("y"), 4).alias("sy"),
        F.round(F.sum(F.col("x1") * F.col("y")), 4).alias("s1y"),
        F.round(F.sum(F.col("x2") * F.col("y")), 4).alias("s2y"),
        F.round(F.sum(F.col("y") * F.col("y")), 4).alias("syy"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y, syy = F.col("sy"), F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    r2 = F.lit(1.0) - (syy - b0 * sy - b1 * s1y - b2 * s2y) / (
        syy - sy * sy / n
    )
    scale = lambda c: F.floor(c * 1000000) / 1000000  # noqa: E731
    return m.select(
        n.cast("long").alias("n"),
        scale(b0).alias("b0"),
        scale(b1).alias("b1"),
        scale(b2).alias("b2"),
        scale(r2).alias("r2"),
    )


def logreg_features(df: DataFrame) -> DataFrame:
    """The quality-classifier design matrix: (lang == 'en') label +
    three text statistics.  SINGLE-SOURCED — q_llm_logreg_fit trains
    on it and q_llm_logreg_cert (queries_r10) certifies the same
    construction; edits here change both together."""
    return df.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("label"),
        (F.length("text").cast("double") / 1000).alias("f_len"),
        (F.size(F.split(F.col("text"), " ")).cast("double") / 100).alias(
            "f_words"
        ),
        (
            F.length(F.regexp_replace(F.col("text"), r"[^aeiou]", "")).cast(
                "double"
            )
            / (F.length("text") + 1)
        ).alias("f_vowels"),
    )


@query("q_llm_logreg_fit")  # no SQL oracle: iterative IRLS is not
# SQL-expressible; correctness pinned by tests/test_glm.py
# (distributed moment-pass loop ≡ single-node numpy IRLS to 1e-8,
# deterministic refit, separable-slice stability) — the PCA contract.
def q_llm_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-score a quality classifier ON the corpus (the
    fasttext-style step CCNet/LLaMA pipelines run; completes
    q_llm_quality_classifier, which scores with FIXED weights):
    logistic regression of (lang == 'en') on three text statistics,
    fitted by operators/glm.logistic_fit — each IRLS iteration is one
    map-side moment aggregate with the coefficients broadcast as
    literals (no shuffle, no UDF; the driver solves a 4×4 system),
    then a map-only scoring pass.  Output is (doc_id, label,
    FLOOR-scaled score) — scalar wire form."""
    from clickhub_spark.operators.glm import logistic_fit, logistic_score

    docs = logreg_features(load(spark, sf_dir, "documents"))
    beta = logistic_fit(docs, ["f_len", "f_words", "f_vowels"], "label")
    return (
        logistic_score(docs, ["f_len", "f_words", "f_vowels"], beta)
        .select(
            "doc_id",
            "label",
            (F.floor(F.col("score") * 1000000) / 1000000).alias("score"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_seq_next_node",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ), v AS (
        SELECT user_id, next_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM o WHERE event_type = 'view'
    )
    SELECT user_id, next_type FROM v WHERE rn = 1 ORDER BY user_id
    """,
)
def q_seq_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceNextNode analog (ClickHouse's where-do-users-go-NEXT
    funnel primitive, completing the sequence family next to
    q_seq_match/q_seq_count/q_funnel): for each user, the event type
    immediately FOLLOWING their first 'view' event in time order —
    NULL when the view is the user's last event, exactly
    sequenceNextNode('forward','first_match')'s contract.

    100 TB shape: ONE user_id exchange feeds both windows (lead and
    the first-match row_number run over the same partitioning —
    Catalyst reuses the sort), so cost is the sessionize shape: one
    shuffle of the facts, zero joins, no SinglePartition anywhere.
    Both windows carry the (ts, event_id) unique tiebreaker so the
    selected row is deterministic across engines."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.withColumn("next_type", F.lead("event_type").over(w))
    first_view = (
        nxt.where(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return first_view.select("user_id", "next_type").orderBy("user_id")


@query(
    "q_agg_topk_sketch",
    oracle="""
    WITH w AS (
        SELECT string_split(text, ' ') AS ws FROM documents
    ), g AS (
        SELECT array_to_string(ws[i:i+2], ' ') AS gram
        FROM w, UNNEST(generate_series(1, len(ws) - 2)) t(i)
        WHERE len(ws) >= 3
    ), c AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS est FROM g GROUP BY gram
    )
    SELECT gram, est, est AS lo, est AS hi
    FROM c ORDER BY est DESC, gram LIMIT 10
    """,
)
def q_agg_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (ClickHouse ``topK`` — which is a
    Space-Saving sketch, NOT an exact count; q_topk_freq keeps the
    exact form): the 10 most frequent word 3-grams in the corpus via
    operators/topk.topk_sketch — per-partition bounded-memory
    summaries, shuffle ≤ capacity·P rows regardless of key
    cardinality, merge yields a certified [lo, hi] interval per key.

    Oracle parity is EXACT by construction: the corpus vocabulary is
    31 words, so the 3-gram key space is ≤ 31³ = 29,791 < the 32,768
    capacity — no partition can ever evict, every error and floor is
    0, and est = lo = hi = the true count at ANY scale factor (the
    eviction regime's invariants are pinned by
    tests/test_topk_sketch.py instead).  Ties on est are broken by
    gram on both sides so the selected row SET is deterministic."""
    from clickhub_spark.operators.dedup import shingles
    from clickhub_spark.operators.topk import topk_sketch

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingles(docs, "text", "doc_id", k=3, distinct=False)
    return topk_sketch(sh, "shingle", 10, capacity=32768).select(
        F.col("key").alias("gram"), "est", "lo", "hi"
    )


@query(
    "q_agg_topk_weighted",
    oracle="""
    WITH w AS (
        SELECT CAST(user_id AS VARCHAR) AS usr,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
    ), c AS (
        SELECT usr, CAST(SUM(cents) AS BIGINT) AS est FROM w GROUP BY usr
    )
    SELECT usr, est, est AS lo, est AS hi
    FROM c ORDER BY est DESC, usr LIMIT 5
    """,
)
def q_agg_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted approximate heavy hitters (ClickHouse ``topKWeighted``
    — q_agg_topk_sketch's weighted sibling): the 5 users carrying the
    most total event value, ranked by summed integer weight (cents:
    FLOOR(value·100) — both engines floor the identical IEEE product,
    so the weights are bit-identical) through the same Misra-Gries
    summary (operators/topk.topk_sketch, weight_col form).

    Oracle parity is exact by construction: user cardinality (≤1,500
    at sf0.1) is far under the 4,096 capacity, so no partition can
    overflow and est = lo = hi = the exact weighted total at any SF;
    the weighted eviction regime is pinned by
    tests/test_topk_sketch.py."""
    from clickhub_spark.operators.topk import topk_sketch

    # explicit NULL contract (ADVICE r7): the sketch drops NULL-weight
    # rows JVM-side and pandas groupby drops NULL keys — mirror both
    # in the filter + oracle so parity is by contract, not data shape
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return topk_sketch(
        ev, "user_id", 5, capacity=4096, weight_col="cents"
    ).select(F.col("key").alias("usr"), "est", "lo", "hi")
