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
                  GREATEST(len(a), len(b))) * 10000) / 10000 AS sim_norm
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
    sim = (
        F.lit(1.0)
        - lev.cast("double") / F.greatest(F.length("a"), F.length("b"))
    )
    return pairs.select(
        "doc_id",
        lev.alias("edit_dist"),
        F.levenshtein("a", "b", 8).alias("edit_dist_capped"),
        (F.floor(sim * 10000) / 10000).alias("sim_norm"),
    ).orderBy("doc_id")
