"""Streaming/incremental operators, batch-equivalent forms — SURVEY
§2.I.  The canonical semantics are these batch queries (oracle-
checked); the actual Structured Streaming implementations live in
clickhub_spark/streaming/ and are unit-tested for batch/stream
equivalence (SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query


@query(
    "q_stream_tumble",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (≙ the stars-MV pattern applied
    per time bucket, SURVEY §2.I3).  Streaming form:
    streaming/mv.py uses window('ts','1 hour') + watermark; hour
    buckets align identically to date_trunc."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_idx
        FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap, batch form
    (SURVEY §2.I3): gap-flag via lag, session id via running sum —
    the exact semantics session_window('ts','30 minutes') gives the
    streaming path (streaming/mv.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    ev = load(spark, sf_dir, "events")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double") > 1800),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_idx", F.sum("is_new").over(run))
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@query(
    "q_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS p_user,
           p.ts AS purchase_ts, c.event_id AS click_id,
           c.ts AS click_ts, ROUND(p.value, 2) AS value
    FROM events p
    JOIN events c ON c.user_id = p.user_id
                 AND c.event_type = 'click'
                 AND c.ts <= p.ts
                 AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join, batch-equivalent form (SURVEY §2.I):
    purchases matched to same-user clicks in the preceding 30 minutes
    — the identical DataFrame expression streaming/mv.
    stream_stream_join runs with watermarks on both sides (unit-tested
    equal on static inputs).  The time-band predicate rides the
    user_id equi-key, so Catalyst plans a hash join + residual range
    filter, never a cartesian."""
    from clickhub_spark.streaming.mv import stream_stream_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    out = stream_stream_join(clicks, purchases, window_seconds=1800)
    return out.select(
        "purchase_id",
        "p_user",
        "purchase_ts",
        "click_id",
        "click_ts",
        F.round("value", 2).alias("value"),
    )
