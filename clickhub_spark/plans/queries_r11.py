"""Round-11 query wave: the two-stage PQ re-rank recall
certification.

Round 11's 500k-vector ANN smoke (tools/smoke_ann_scale.py, VERDICT
r10 #4) showed the single-stage ADC recall floor certified at
sf<=0.1 does NOT survive realistic corpus density: quantization
distortion stays constant while true-neighbor sim gaps shrink, so
recall@20 falls from ~0.44 (2k vectors) to ~0.30 (50k).  The
production serving shape is therefore TWO-STAGE — ADC candidates,
exact re-rank (operators/knn.py:pq_rerank_topk) — and this module
certifies that path the same way q_llm_knn_pq_recall certifies the
single-stage scan: a driver-checkable boolean over the registered
build-once artifact.

Measured two-stage recall@20 (m=16, n_codes=32, rerank=10x):
1.000 / 0.998 / 0.950 at sf0.001/0.01/0.1 and 0.855 at 50k clustered
vectors — gate 0.60 keeps ~30% headroom under the worst measured
point while sitting far above the single-stage floor it repairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhub_spark.plans.queries_core import load
from clickhub_spark.plans.queries_r10 import (
    _NQ,
    _PQ_CODES,
    _PQ_K,
    _PQ_M,
    _exact_pairs,
)
from clickhub_spark.plans.registry import query

#: ADC candidate depth of the certified two-stage configuration:
#: 10 candidates per final slot (rerank = 10 * k = 200), the ratio
#: tools/smoke_ann_scale.py certifies at 500k vectors.
_PQ_RERANK = 10 * _PQ_K


@query(
    "q_llm_knn_pq_rerank_recall",
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
           CAST(0 AS BIGINT) AS cand_overflow,
           CAST(1 AS INT) AS recall_ge_060
    FROM t, q
    """,
)
def q_llm_knn_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall certification for the TWO-STAGE PQ serving path
    (operators/knn.py:pq_rerank_topk): ADC top-(10·k) candidates per
    query from the same build-once artifact q_llm_knn_pq serves
    (m=16, n_codes=32), exact cosine re-rank to top-20, mean recall
    over 20 query vectors against the exact top-20 as a
    driver-checkable boolean.

    Also pins the structural contract of the candidate stage:
    cand_overflow counts queries whose candidate set exceeds the
    rerank depth (must be 0 — the window cap is the stage's whole
    scale guarantee: the exact re-rank touches at most 10·k raw
    vectors per query no matter the corpus size).

    Plan shape: one mapInPandas ADC scan emitting all 20 queries'
    sims per Arrow batch (the single-stage cert's own scan), a rank
    window capped at 10·k, a broadcast semi-join of the tiny
    candidate table back to the raw vectors, and a second rank
    window over candidate rows only.  At 100 TB the codes scan does
    all the data-volume work; stage two is 20 x 200 rows."""
    import os

    import numpy as np
    import pandas as pd

    from clickhub_spark.artifacts import derived_artifact_path
    from clickhub_spark.functions.vectors import cosine
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

    # parameter fetches: m x n_codes codebook + the 20 query vectors
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
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    tables = np.stack(
        [
            ((Qn[:, None, s * d : (s + 1) * d] - books[s][None, :, :]) ** 2).sum(-1)
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
    wc = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vid").asc()
    )
    cand = (
        sims.withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") <= _PQ_RERANK)
        .select("qid", F.col("vid").alias("vec_id"))
    )

    # stage two: exact cosine over candidate rows only (broadcast of
    # the <= nq * rerank candidate table), then the final top-k rank
    rer = (
        emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "qid")
        .withColumn("sim", cosine(F.col("v"), F.col("qv")))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    ann = (
        rer.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= _PQ_K)
        .select("qid", "vec_id")
    )
    exact = _exact_pairs(emb, q, _PQ_K)

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
            cand.groupBy("qid")
            .agg(F.count(F.lit(1)).alias("__nc"))
            .agg(
                F.sum(
                    (F.col("__nc") > _PQ_RERANK).cast("long")
                ).alias("cand_overflow")
            )
        )
    )
    return counts.select(
        "n_vectors",
        "n_queries",
        "n_exact_pairs",
        F.coalesce(F.col("cand_overflow"), F.lit(0)).alias("cand_overflow"),
        (F.col("__hits") >= 0.60 * F.col("n_exact_pairs"))
        .cast("int")
        .alias("recall_ge_060"),
    )


# --------------------------------------------------------------------------
# §2.D sequence family: multi-match funnel + sequenceNextNode
# --------------------------------------------------------------------------


@query(
    "q_funnel_multimatch",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, s.step
        FROM events, UNNEST([
            CASE WHEN event_type = 'view' AND value < 8 THEN 0 END,
            CASE WHEN (event_type = 'click' AND value < 12)
                   OR (event_type = 'view' AND value < 4) THEN 1 END,
            CASE WHEN (event_type = 'purchase' AND value < 16)
                   OR value < 2 THEN 2 END
        ]) AS s(step)
        WHERE user_id IS NOT NULL AND s.step IS NOT NULL
    ), o AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id, step) AS rn
        FROM e
    ), s0 AS (
        SELECT *,
               MAX(CASE WHEN step = 0 THEN rn END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a0
        FROM o
    ), s1 AS (
        SELECT *, (step = 1 AND a0 IS NOT NULL) AS q2 FROM s0
    ), s2 AS (
        SELECT *,
               MAX(CASE WHEN q2 THEN rn END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a1
        FROM s1
    ), lvl AS (
        SELECT user_id,
               CASE WHEN step = 2 AND a1 IS NOT NULL THEN 3
                    WHEN q2 THEN 2
                    WHEN step = 0 THEN 1 ELSE 0 END AS l
        FROM s2
    ), u AS (
        SELECT user_id, MAX(l) AS level FROM lvl GROUP BY user_id
    )
    SELECT CAST(level AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY level
    """,
)
def q_funnel_multimatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel with OVERLAPPING step conditions (multi-match,
    NEW round 11 — operators/funnel.py): one event can advance
    several pending levels, exactly as the engine's aggregate inserts
    one (ts, step) entry per matched condition.  Steps here overlap
    on purpose: a 'view' event with value < 2 matches ALL THREE
    conditions (view & value<8; view & value<4; value<2) and climbs
    the whole funnel alone.

    The oracle transcribes the entry-explode + chained running-max
    construction (the family's documented oracle posture); the
    SEMANTICS are pinned independently by
    tests/test_funnel_differential.py::test_differential_multi_match,
    a fuzz against the sequential engine-scan transcription over
    overlapping alphabets.

    Plan: map-side explode (<= 3 entries/event, no shuffle), then the
    single-match DP — one user_id exchange, one sort, K window
    passes."""
    from clickhub_spark.operators.funnel import window_funnel

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ty, val = F.col("event_type"), F.col("value")
    levels = window_funnel(
        ev,
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[
            (ty == "view") & (val < 8),
            ((ty == "click") & (val < 12)) | ((ty == "view") & (val < 4)),
            ((ty == "purchase") & (val < 16)) | (val < 2),
        ],
        multi_match=True,
    )
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_seq_next_node_chain",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS nxt1,
               LEAD(event_type, 2) OVER w AS nxt2,
               row_number() OVER w AS rn
        FROM events WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), m AS (
        SELECT user_id, nxt2,
               row_number() OVER (PARTITION BY user_id ORDER BY rn) AS mr
        FROM o WHERE event_type = 'view' AND nxt1 = 'click'
    )
    SELECT COALESCE(nxt2, '<end>') AS next_node,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM m WHERE mr = 1
    GROUP BY 1
    """,
)
def q_seq_next_node_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceNextNode with a MULTI-EVENT base chain (ClickHouse
    ``sequenceNextNode('forward', 'first_match')(ts, event_type,
    event_type = 'view', event_type = 'view', event_type =
    'click')``): for each user, the event that FOLLOWS the first
    consecutive view→click pair in the time-ordered stream ('<end>'
    when the chain closes the stream).  Completes the family next to
    q_seq_next_node (queries_r7), which covers the single-event
    base.

    One user_id exchange shared by the lead pair scan and the
    first-match rank; the aggregate runs on <=1 row per user."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
        F.row_number().over(w).alias("rn"),
    )
    m = o.where(
        (F.col("event_type") == "view") & (F.col("nxt1") == "click")
    ).withColumn(
        "mr",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("rn")
        ),
    )
    return (
        m.where(F.col("mr") == 1)
        .groupBy(F.coalesce(F.col("nxt2"), F.lit("<end>")).alias("next_node"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --------------------------------------------------------------------------
# general sequenceMatch/sequenceCount operator (operators/seqmatch) —
# arbitrary patterns with overlapping conditions, registered over the
# events table.  Bitset alphabet shared with the oracle: conds (c1=view,
# c2=click OR value<40, c3=purchase) → bitset 1..7 → substr('ABCDEFG').
# --------------------------------------------------------------------------


@query(
    "q_seq_match_pattern",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                + CASE WHEN event_type = 'click' OR value < 40
                       THEN 2 ELSE 0 END
                + CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END)
                   AS b
        FROM events WHERE user_id IS NOT NULL
    ), s AS (
        SELECT user_id,
               string_agg(substr('ABCDEFG', b, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM e WHERE b > 0 GROUP BY user_id
    )
    SELECT user_id,
           regexp_matches(seq, '[ACEG].*[BCFG].*[DEFG]') AS matched
    FROM s
    """,
)
def q_seq_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General sequenceMatch operator (operators/seqmatch.py, NEW
    round 11) on an OVERLAPPING condition set — ClickHouse
    ``sequenceMatch('(?1).*(?2).*(?3)')(ts, type='view',
    type='click' OR value<40, type='purchase')``: a low-value view
    event matches conditions 1 AND 2 simultaneously (one entry, two
    bits), which the fixed-shape q_seq_match cannot express.

    JVM path: per-user bitset chars → one rlike; one user_id shuffle,
    no Python.  Engine-automaton semantics differentially pinned in
    tests/test_seqmatch.py over random overlapping streams."""
    from clickhub_spark.operators.seqmatch import sequence_match

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ty, val = F.col("event_type"), F.col("value")
    return sequence_match(
        ev,
        "user_id",
        ["ts", "event_id"],
        [ty == "view", (ty == "click") | (val < 40), ty == "purchase"],
        "(?1).*(?2).*(?3)",
    )


@query(
    "q_seq_count_adjacent",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                + CASE WHEN event_type = 'click' OR value < 40
                       THEN 2 ELSE 0 END
                + CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END)
                   AS b
        FROM events WHERE user_id IS NOT NULL
    ), s AS (
        SELECT user_id,
               string_agg(substr('ABCDEFG', b, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM e WHERE b > 0 GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(seq, '[BCFG][DEFG]')) AS INT)
               AS n_matches
    FROM s
    """,
)
def q_seq_count_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General sequenceCount with DIRECT adjacency — ClickHouse
    ``sequenceCount('(?1)(?2)')``: how many times a condition-2 entry
    immediately follows a condition-1 entry in the user's entry list
    (non-overlapping, scan-restart semantics ≡ left-to-right
    non-overlapping regex find).  Conditions overlap as in
    q_seq_match_pattern; conds here are (c1 = click OR value<40,
    c2 = purchase) mapped onto the same 3-bit alphabet."""
    from clickhub_spark.operators.seqmatch import sequence_count

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ty, val = F.col("event_type"), F.col("value")
    out = sequence_count(
        ev,
        "user_id",
        ["ts", "event_id"],
        [ty == "view", (ty == "click") | (val < 40), ty == "purchase"],
        "(?2)(?3)",
    )
    return out


@query(
    "q_seq_match_events",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               (event_type = 'view') AS c1,
               (event_type = 'click' OR value < 40) AS c2,
               (event_type = 'purchase') AS c3
        FROM events
        WHERE user_id IS NOT NULL
          AND (event_type IN ('view', 'click', 'purchase')
               OR value < 40)
    ), m1 AS (
        SELECT user_id, MIN(rn) AS r1 FROM e WHERE c1 GROUP BY user_id
    ), m2 AS (
        SELECT e.user_id, MIN(rn) AS r2
        FROM e JOIN m1 USING (user_id)
        WHERE c2 AND rn > r1 GROUP BY e.user_id
    ), m3 AS (
        SELECT e.user_id, MIN(rn) AS r3
        FROM e JOIN m2 USING (user_id)
        WHERE c3 AND rn > r2 GROUP BY e.user_id
    ), u AS (SELECT DISTINCT user_id FROM e)
    SELECT u.user_id,
           (m3.user_id IS NOT NULL) AS matched,
           ROUND(CASE WHEN m3.user_id IS NOT NULL
                 THEN (SELECT t FROM e WHERE e.user_id = u.user_id
                       AND e.rn = m1.r1) END, 6) AS ts1,
           ROUND(CASE WHEN m3.user_id IS NOT NULL
                 THEN (SELECT t FROM e WHERE e.user_id = u.user_id
                       AND e.rn = m2.r2) END, 6) AS ts2,
           ROUND(CASE WHEN m3.user_id IS NOT NULL
                 THEN (SELECT t FROM e WHERE e.user_id = u.user_id
                       AND e.rn = m3.r3) END, 6) AS ts3
    FROM u
    LEFT JOIN m1 USING (user_id)
    LEFT JOIN m2 USING (user_id)
    LEFT JOIN m3 USING (user_id)
    """,
)
def q_seq_match_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatchEvents analog (operators/seqmatch.py, NEW round
    11): the TIMESTAMPS of the entries matched by each (?N) atom of
    the first match of ``(?1).*(?2).*(?3)`` over overlapping
    conditions (c2 = click OR value<40 overlaps c1 = view).

    The oracle derives the trail INDEPENDENTLY of the automaton: for
    an all-subsequence pattern the first match is the greedy one —
    first c1 entry, first c2 entry after it, first c3 entry after
    that — three correlated mins over the entry list, not a
    transcription of the backtracking code.  Trail exploded to scalar
    columns (the driver compare hashes scalars, not arrays)."""
    from clickhub_spark.operators.seqmatch import sequence_match_events

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ty, val = F.col("event_type"), F.col("value")
    out = sequence_match_events(
        ev,
        "user_id",
        ["ts", "event_id"],
        [ty == "view", (ty == "click") | (val < 40), ty == "purchase"],
        "(?1).*(?2).*(?3)",
        ts_col="ts",
    )
    t = F.col("event_times")
    return out.select(
        "user_id",
        (F.size(t) == 3).alias("matched"),
        F.round(F.element_at(t, 1), 6).alias("ts1"),
        F.round(F.element_at(t, 2), 6).alias("ts2"),
        F.round(F.element_at(t, 3), 6).alias("ts3"),
    )
