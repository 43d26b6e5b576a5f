"""Round-8 query wave.

Driver-checkable evidence for the EVICTION regime of the Misra-Gries
heavy-hitter sketch (VERDICT r7 item 4): q_agg_topk_sketch and
q_agg_topk_weighted run where capacity exceeds key cardinality, so
their driver rows only certify the exact regime; the sketch's whole
point — certified [lo, hi] bounds while counters are being evicted —
was pinned by units alone.  q_agg_topk_bounds closes that gap with an
oracle-checked query whose OUTPUT is the certification itself.

Second wave: the last ClickHouse table-engine semantics the tree
lacked — CollapsingMergeTree and VersionedCollapsingMergeTree FINAL
(operators/collapsing.py; siblings of q_dedup_replacing's
ReplacingMergeTree) — plus ARRAY JOIN / LEFT ARRAY JOIN (explode /
explode_outer) and windowFunnel's ``strict_order`` mode (the plain
subsequence mode is q_funnel / q_seq_match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query

#: sketch capacity for the forced-eviction certification query —
#: deliberately below the key cardinality at EVERY test SF (4 / 8 / 11
#: distinct log-buckets at sf0.001/0.01/0.1) so each partition's
#: summary evicts and the [lo, hi] interval is genuinely approximate
_BOUNDS_CAP = 3


@query(
    "q_agg_topk_bounds",
    oracle=f"""
    WITH k AS (
        SELECT length(bin(user_id)) AS kb
        FROM events WHERE user_id IS NOT NULL
    ), c AS (
        SELECT kb, count(*) AS cnt FROM k GROUP BY kb
    ), t AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM c
    )
    SELECT n_events, n_keys,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c
             WHERE cnt * {_BOUNDS_CAP + 1} > (SELECT n_events FROM t))
               AS n_heavy,
           CAST(0 AS BIGINT) AS viol_bounds,
           CAST(0 AS BIGINT) AS missing_heavy
    FROM t
    """,
)
def q_agg_topk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified-bound check for the Misra-Gries sketch UNDER EVICTION
    (the regime ClickHouse ``topK`` actually runs in at scale — the
    exact-regime twins are q_agg_topk_sketch / q_agg_topk_weighted).

    Events are bucketed by ``length(bin(user_id))`` — a deterministic
    log-scale key whose top bucket carries ~1/3 of all mass — and
    sketched at capacity 3, below the key cardinality at every test
    SF, so every partition's summary evicts counters and the reported
    [lo, hi] intervals are genuinely approximate (lo < hi).  The query
    then joins the sketch output back to the exact per-key counts and
    emits the certification as data:

    - ``viol_bounds``  — reported keys whose exact count falls outside
      [lo, hi], or that don't exist at all.  0 by the MG invariant
      (operators/topk.py: per-partition c ≤ true_p ≤ c + D_p, absent
      keys ≤ D_p — sums over partitions).
    - ``missing_heavy`` — keys with exact count > N/(capacity+1) that
      the sketch failed to report.  0 by the frequent-elements
      guarantee: a key absent from every partition summary has
      true ≤ Σ_p D_p ≤ Σ_p N_p/(cap+1) = N/(cap+1).
    - ``n_events`` / ``n_keys`` / ``n_heavy`` — exact scalars both
      engines compute independently (heavy via integer cross-multiply,
      cnt·(cap+1) > N — no float division to diverge on).

    Both zero-columns are THEOREMS, not data accidents: they hold for
    any partition layout, so the row is deterministic even though the
    sketch's per-key estimates under eviction are not.  The exact
    groupBy exists only to certify the sketch — at 100 TB you'd run
    the sketch alone; here the key space is tiny (≤11) so the check
    costs one extra shuffle of ≤11 rows."""
    from clickhub_spark.operators.topk import topk_sketch

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(F.length(F.bin("user_id")).alias("kb"))
    )
    # lazy persist: kb feeds both the sketch pass and the exact
    # groupBy; one corpus read when the combined plan executes
    ev = ev.persist()
    # k = 1 << 20 ≫ capacity·P: keep ALL surviving keys (no top-k cut
    # — the bound check must see the sketch's full report)
    sk = topk_sketch(ev, "kb", 1 << 20, capacity=_BOUNDS_CAP).select(
        F.col("key").alias("kb"), "lo", "hi"
    )
    exact = ev.groupBy(F.col("kb").cast("string").alias("kb")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = exact.agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    heavy = exact.crossJoin(F.broadcast(tot)).where(
        F.col("cnt") * (_BOUNDS_CAP + 1) > F.col("n_events")
    )
    n_heavy = heavy.agg(F.count(F.lit(1)).alias("n_heavy"))
    viol = (
        sk.join(F.broadcast(exact), "kb", "left")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("cnt").isNull()
                        | (F.col("lo") > F.col("cnt"))
                        | (F.col("hi") < F.col("cnt")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("viol_bounds")
        )
    )
    missing = (
        heavy.select("kb")
        .join(F.broadcast(sk.select("kb")), "kb", "left_anti")
        .agg(F.count(F.lit(1)).alias("missing_heavy"))
    )
    return (
        tot.crossJoin(F.broadcast(n_heavy))
        .crossJoin(F.broadcast(viol))
        .crossJoin(F.broadcast(missing))
        .select("n_events", "n_keys", "n_heavy", "viol_bounds", "missing_heavy")
    )


# --------------------------------------------------------------------------
# §2.E collapsing-engine siblings of ReplacingMergeTree
# --------------------------------------------------------------------------


@query(
    "q_dedup_collapsing",
    oracle="""
    SELECT user_id, event_id AS last_event, event_type AS last_type,
           value AS last_value
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn,
               count(*) OVER (PARTITION BY user_id) AS cnt
        FROM events WHERE user_id IS NOT NULL
    ) WHERE rn = 1 AND cnt % 5 <> 0
    """,
)
def q_dedup_collapsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree FINAL (≙ ENGINE = CollapsingMergeTree(sign)
    — the changelog sibling of q_dedup_replacing's ReplacingMergeTree,
    reference README.md:132-134 DDL family).

    The query BUILDS a genuine sign-changelog from events — every event
    writes a +1 state row, every superseded event a -1 cancel, and
    users whose event count is ≡0 (mod 5) get their final state
    cancelled too — then collapses it with the generic single-shuffle
    operator (operators/collapsing.py:collapse_final).  The oracle
    derives the expected survivor set INDEPENDENTLY (last event per
    user, minus fully-cancelled users), so it checks the collapse
    semantics, not the changelog plumbing.  32 of 150 users at sf0.01
    exercise the fully-cancelled (net = 0) path."""
    from clickhub_spark.operators.collapsing import collapse_final

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
    w = Window.partitionBy("user_id")
    # single pass, no cache: each event emits its +1 state and — when
    # superseded or in a fully-cancelled user — also its -1 cancel,
    # via a map-side explode of the sign array.  (The round-8 form
    # persisted the corpus-scale windowed frame to share it across a
    # states/cancels union and never unpersisted — ADVICE r8 item 5.)
    seq = ev.withColumn(
        "__rn", F.row_number().over(w.orderBy("ts", "event_id"))
    ).withColumn("__cnt", F.count(F.lit(1)).over(w))
    cancelled = (F.col("__rn") < F.col("__cnt")) | (F.col("__cnt") % 5 == 0)
    log = seq.select(
        *ev.columns,
        F.explode(
            F.when(cancelled, F.array(F.lit(1), F.lit(-1))).otherwise(
                F.array(F.lit(1))
            )
        ).alias("sign"),
    )
    return collapse_final(
        log, keys=["user_id"], sign="sign", order=["ts", "event_id"]
    ).select(
        "user_id",
        F.col("event_id").alias("last_event"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


@query(
    "q_dedup_collapsing_versioned",
    oracle="""
    SELECT user_id, CAST(rn AS BIGINT) AS version,
           event_id AS last_event, event_type AS last_type
    FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events WHERE user_id IS NOT NULL
    ) WHERE rn % 3 <> 0
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) = 1
    """,
)
def q_dedup_collapsing_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL (≙ ENGINE =
    VersionedCollapsingMergeTree(sign, version)): cancels revoke the
    state carrying the SAME version — not merely the previous state —
    so arbitrary versions can be retracted regardless of write order.

    Changelog: every event is a +1 state row versioned by its per-user
    sequence number; every version ≡0 (mod 3) also gets a -1 cancel —
    retractions scattered through the middle of each user's history,
    which plain collapsing cannot express.  FINAL must therefore
    surface the highest NON-cancelled version per user
    (operators/collapsing.py:collapse_final_versioned — per-(key,
    version) sign fold, then a max-version fold over survivors); the
    oracle computes that expectation independently."""
    from clickhub_spark.operators.collapsing import collapse_final_versioned

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "event_id", "ts", "event_type")
    )
    # single pass, no cache: versions ≡0 (mod 3) emit both their +1
    # state and the -1 retraction via a map-side sign explode (see
    # q_dedup_collapsing — replaces the r8 never-unpersisted persist)
    seq = ev.withColumn(
        "version",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long"),
    )
    log = seq.select(
        *seq.columns,
        F.explode(
            F.when(
                F.col("version") % 3 == 0, F.array(F.lit(1), F.lit(-1))
            ).otherwise(F.array(F.lit(1)))
        ).alias("sign"),
    )
    return collapse_final_versioned(
        log, keys=["user_id"], sign="sign", version="version",
        order=["ts", "event_id"],
    ).select(
        "user_id",
        "version",
        F.col("event_id").alias("last_event"),
        F.col("event_type").alias("last_type"),
    )


# --------------------------------------------------------------------------
# §2.G ARRAY JOIN / LEFT ARRAY JOIN
# --------------------------------------------------------------------------


@query(
    "q_fn_array_join",
    oracle="""
    WITH o AS (
        SELECT p_partkey,
               list_slice(string_split(p_name, ' '), 1,
                          CAST(p_partkey % 4 AS INT)) AS arr
        FROM part
    ), ex AS (
        SELECT o.p_partkey, u.word
        FROM o LEFT JOIN LATERAL (SELECT UNNEST(arr) AS word) u ON TRUE
    )
    SELECT COALESCE(word, '<empty>') AS word_g,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts
    FROM ex GROUP BY 1 ORDER BY n DESC, word_g LIMIT 20
    """,
)
def q_fn_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY JOIN + LEFT ARRAY JOIN (ClickHouse's explode clause):
    unnest an array column to one row per element, LEFT variant keeping
    rows whose array is empty (Spark ``explode_outer`` ≙ LEFT ARRAY
    JOIN; the NULL element those rows surface as is grouped under
    '<empty>' — dropping it would be plain ARRAY JOIN / ``explode``).

    Arrays are built per part as the first ``p_partkey % 4`` words of
    p_name (lengths 0–3, so ~¼ of parts exercise the LEFT path), then
    the exploded relation re-aggregates per word.  Plan: map-side
    Generate (explode) feeding one hash-aggregate shuffle — exploding
    never materializes per-row lists driver-side and the top-20 cut is
    TakeOrdered, so the shape holds at corpus scale."""
    arr = (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.slice(
                F.split("p_name", " "), 1, (F.col("p_partkey") % 4).cast("int")
            ).alias("arr"),
        )
    )
    ex = arr.select("p_partkey", F.explode_outer("arr").alias("word"))
    return (
        ex.groupBy(F.coalesce("word", F.lit("<empty>")).alias("word_g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
        .orderBy(F.col("n").desc(), F.col("word_g").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# §2 funnel: windowFunnel strict_order mode
# --------------------------------------------------------------------------


@query(
    "q_funnel_strict",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), runs AS (
        SELECT user_id, regexp_extract(seq, 'v[vcp]*') AS run FROM seqs
    )
    SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
        SELECT CAST(CASE WHEN run = ''                  THEN 0
                         WHEN regexp_matches(run, '^v+p') THEN 1
                         WHEN run LIKE '%c%p%'          THEN 3
                         WHEN run LIKE '%c%'            THEN 2
                         ELSE 1 END AS INT) AS level
        FROM runs
    ) GROUP BY level
    """,
)
def q_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel strict_order mode, true ClickHouse scan semantics
    (round-10 rewrite, ADVICE r9 #1): the view → click → purchase scan
    aborts at the first event matching NO step once a chain has
    started; within the scanned prefix the chain is a SUBSEQUENCE
    (later-step events don't break it, repeated steps re-match).
    ClickHouse: windowFunnel(w, 'strict_order')(ts, ...) — docs:
    A,B,D,C → 2; v,s,v,c,p → 1; v,c,c,p → 3.

    The abort also fires on an OUT-OF-ORDER step event — one whose
    previous level is unachieved (the engine's strict_order branch
    returns the levels-so-far count): a p before any c stops the scan
    at level 1.

    The Spark side is K chained running-max window columns over one
    per-user sort (operators/funnel.window_funnel_strict — the greedy
    DP's chain starts are non-decreasing, so last ≡ max).  The oracle
    keeps an independent collapse-to-string derivation: the scanned
    prefix is exactly regexp 'v[vcp]*' over the per-user initial
    string; inside it (unbounded window ⇒ any c after the leading v
    achieves level 2) the level is: '^v+p' ⇒ premature-p abort at 1,
    '%c%p%' ⇒ 3, '%c%' ⇒ 2, else 1 — a different construction of the
    same semantics.  The time-bounded sibling is
    q_funnel_strict_window."""
    from clickhub_spark.operators.funnel import window_funnel_strict

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ini = F.substring("event_type", 1, 1)
    levels = window_funnel_strict(
        ev,
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
    )
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# §2.E GraphiteMergeTree retention rollup
# --------------------------------------------------------------------------


@query(
    "q_agg_retention_rollup",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CASE WHEN ts >= TIMESTAMP '2024-01-25 00:00:00' THEN 3600
                    WHEN ts >= TIMESTAMP '2024-01-11 00:00:00' THEN 21600
                    ELSE 86400 END AS bucket_s,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
               value
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(bucket_s AS BIGINT) AS bucket_s,
           CAST(FLOOR(es / bucket_s) * bucket_s AS BIGINT) AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM e GROUP BY event_type, bucket_s, bucket_start
    """,
)
def q_agg_retention_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphiteMergeTree retention rollup (≙ ENGINE = GraphiteMergeTree
    retention rules — the age-tiered downsampling sibling in the
    README.md:132-134 engine family; the last MergeTree semantic the
    tree lacked): events newer than Jan 25 keep 1-hour resolution,
    Jan 11–25 collapse to 6-hour buckets, older to 1-day — cutoffs
    pinned to a fixed "now" (2024-02-01) so the rollup is
    deterministic at every SF (testdata spans Jan 1–30).

    One hash aggregate on (event_type, bucket): the tier CASE and the
    epoch-second bucket arithmetic are map-side scalars (integer
    truncation on both engines — unix_timestamp ≡ FLOOR(epoch)), so at
    100 TB the exchange carries keys × buckets, never raw rows.
    Generic operator: operators/retention.rollup_retention; physical
    merge form: optimize_rollup."""
    from clickhub_spark.operators.retention import rollup_retention

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "ts", "value")
    )
    return rollup_retention(
        ev,
        ts_col="ts",
        keys=["event_type"],
        value_col="value",
        tiers=[("2024-01-25 00:00:00", 3600), ("2024-01-11 00:00:00", 21600)],
        default_bucket_s=86400,
    )
