"""ClickHouse-signature analytics operators — SAMPLE clause, funnel
analysis (windowFunnel), cohort retention (retention()), and -Array
aggregate combinators, re-expressed Spark-first with portable
semantics (hash-based sampling instead of nondeterministic random
sampling, so every engine selects the same rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query


@query(
    "q_sample_hash",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '20'
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE clause analog (ClickHouse samples by a hash of the
    sampling key, not randomly — that's what makes samples repeatable
    and joinable across tables).  ~1/8 of rows via the first md5 byte;
    deterministic on any engine, prunable if the table is bucketed by
    the sample key."""
    return (
        load(spark, sf_dir, "events")
        .where(F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < "20")
        .select("event_id", "user_id", "value")
    )


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS INT)
               AS funnel_level
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel analog: per user, how far through the ordered
    chain view → click → purchase did they get (each stage strictly
    after the previous one's first occurrence)?  Three conditional
    min-aggregations chained by time — shuffles only on user_id."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c.select("user_id", F.lit(1).alias("_c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("_p")), "user_id", "left")
        .select(
            "user_id",
            (1 + F.coalesce(F.col("_c"), F.lit(0)) + F.coalesce(F.col("_p"), F.lit(0)))
            .cast("int")
            .alias("funnel_level"),
        )
    )


@query(
    "q_retention",
    oracle="""
    SELECT CAST(SUM(d0) AS BIGINT) AS day0,
           CAST(SUM(CASE WHEN d0 = 1 AND d1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS day1,
           CAST(SUM(CASE WHEN d0 = 1 AND d7 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS day7
    FROM (
        SELECT user_id,
               max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01' THEN 1 ELSE 0 END) AS d0,
               max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-02' THEN 1 ELSE 0 END) AS d1,
               max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-08' THEN 1 ELSE 0 END) AS d7
        FROM events GROUP BY user_id
    )
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention() analog: of users active on day 0, how many returned
    on day 1 / day 7 — per-user conditional max then a gated sum, the
    exact semantics of ClickHouse's retention(cond1, cond2, ...)."""
    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(day == F.lit("2024-01-01").cast("date"), 1).otherwise(0)).alias("d0"),
        F.max(F.when(day == F.lit("2024-01-02").cast("date"), 1).otherwise(0)).alias("d1"),
        F.max(F.when(day == F.lit("2024-01-08").cast("date"), 1).otherwise(0)).alias("d7"),
    )
    return per_user.agg(
        F.sum("d0").alias("day0"),
        F.sum(F.when((F.col("d0") == 1) & (F.col("d1") == 1), 1).otherwise(0)).alias("day1"),
        F.sum(F.when((F.col("d0") == 1) & (F.col("d7") == 1), 1).otherwise(0)).alias("day7"),
    )


@query(
    "q_agg_array_combinator",
    oracle="""
    SELECT label,
           ROUND(SUM(list_sum(CAST(embedding AS DOUBLE[]))), 4) AS sum_all_dims,
           ROUND(AVG(list_aggregate(CAST(embedding AS DOUBLE[]), 'max')), 4) AS avg_max_dim
    FROM embeddings GROUP BY label
    """,
)
def q_agg_array_combinator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-Array aggregate combinators (sumArray/avgArray): aggregate over
    every element of an array column per group — per-row higher-order
    fold, then a plain group aggregate; no explode, so the shuffled
    rows stay one-per-input-row."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    row_sum = F.aggregate(vec, F.lit(0.0), lambda a, x: a + x)
    return (
        load(spark, sf_dir, "embeddings")
        .select("label", row_sum.alias("rs"), F.array_max(vec).alias("rm"))
        .groupBy("label")
        .agg(
            F.round(F.sum("rs"), 4).alias("sum_all_dims"),
            F.round(F.avg("rm"), 4).alias("avg_max_dim"),
        )
    )


@query(
    "q_seq_match",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           regexp_matches(seq, '.*v.*c.*p.*') AS matched,
           CAST(length(seq) AS INT) AS n_events
    FROM seqs
    """,
)
def q_seq_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch analog: did the user's time-ordered event stream
    contain view → … → click → … → purchase?  Events collapse to an
    ordered initial-letter string per user (one shuffle), then a
    regex — the same pattern-over-sequence semantics as ClickHouse's
    sequenceMatch('(?1).*(?2).*(?3)')."""
    ev = load(spark, sf_dir, "events")
    seqs = (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda r: F.substring(r["event_type"], 1, 1),
                ),
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.col("seq").rlike(".*v.*c.*p.*").alias("matched"),
        F.length("seq").alias("n_events"),
    )


@query(
    "q_topk_freq",
    oracle="""
    SELECT user_id, event_type, n FROM (
        SELECT user_id, event_type, COUNT(*) AS n,
               rank() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC) AS rnk
        FROM events GROUP BY user_id, event_type
    ) WHERE rnk <= 2
    """,
)
def q_topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topK / LIMIT BY analog: the 2 most frequent event types per
    user (ties included via rank, so the selected SET is
    deterministic).  Aggregate then window over the small aggregate —
    never a window over raw events."""
    from pyspark.sql.window import Window

    counts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        counts.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 2)
        .select("user_id", "event_type", "n")
    )


@query(
    "q_fill_gaps",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), bounds AS (
        SELECT min(day) AS lo, max(day) AS hi FROM daily
    ), spine AS (
        SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS TIMESTAMP) AS day
        FROM bounds
    )
    SELECT s.day, COALESCE(d.n, 0) AS n
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def q_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (≙ ClickHouse ORDER BY … WITH FILL):
    daily purchase counts with missing days present as zeros.  The
    date spine is sequence()+explode over the aggregate's own min/max
    — generated from a one-row bound, so the spine build is free and
    the only real work is the (broadcast) join back to the daily
    aggregate."""
    daily = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n")
    )


@query(
    "q_agg_histogram",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(FLOOR(value / 10.0) AS INT) AS bucket
        FROM events WHERE value >= 0 AND value < 100
    )
    SELECT event_type, bucket,
           CAST(bucket * 10.0 AS DOUBLE) AS lo,
           CAST((bucket + 1) * 10.0 AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY event_type, bucket
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (≙ ClickHouse histogram()): 10 buckets of
    width 10 over value per event type — floor-binning is a map-side
    expression, so the aggregate shuffles only (type, bucket) pairs."""
    b = (
        load(spark, sf_dir, "events")
        .where((F.col("value") >= 0) & (F.col("value") < 100))
        .select(
            "event_type", F.floor(F.col("value") / 10.0).cast("int").alias("bucket")
        )
    )
    return b.groupBy("event_type", "bucket").agg(
        (F.col("bucket") * 10.0).alias("lo"),
        ((F.col("bucket") + 1) * 10.0).alias("hi"),
        F.count("*").alias("n"),
    )
