"""Incrementally-maintained aggregates — the materialized-view half
of the reference (SURVEY §2.I1): ``github_stars_mv TO github_stars AS
SELECT repo_name, count() FROM github_events WHERE event_type =
'WatchEvent' GROUP BY repo_name`` feeding a SummingMergeTree
(reference README.md:247-268).

Structured Streaming is the exact analog: insert-triggered partial
aggregation with state kept by the engine, update-mode output
re-emitting changed keys — what SummingMergeTree's background merges
do lazily.  Batch forms of every query here are oracle-checked
(plans/queries_stream.py); these streaming builders are unit-tested
for batch≡stream equivalence with an availableNow trigger.

Scale notes: state is per-key counts — bounded by key cardinality,
not event volume; watermarks bound session/window state for event-
time aggregations (late duplicates beyond the watermark fall back to
the batch dedup view, SURVEY §2.I4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_event_stream(
    spark: SparkSession, path: str, schema: StructType, max_files: int = 10
) -> DataFrame:
    """File-source event stream (≙ inserts into github_events)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stars_mv(events: DataFrame, event_type: str = "view") -> DataFrame:
    """The stars MV: filtered group-by-count, update-mode-ready
    (reference README.md:256-262)."""
    return (
        events.where(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(F.count("*").alias("stars"))
    )


def tumbling_counts(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour", delay: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with watermark (SURVEY §2.I3-I4)."""
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), width).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, ts_col: str = "ts", gap: str = "30 minutes", delay: str = "2 hours"
) -> DataFrame:
    """Session windows keyed by user (SURVEY §2.I3)."""
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, mode: str = "complete"):
    """Drain everything currently available into an in-memory sink and
    return the result rows — deterministic test harness (SURVEY §7 M7:
    availableNow trigger)."""
    name = "mv_sink_" + checkpoint.rsplit("/", 1)[-1].replace("-", "_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_seconds: int = 1800,
    delay: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join (SURVEY §2.I): purchases matched to a
    same-user click in the preceding ``window_seconds``.  Watermarks on
    BOTH sides bound the join state — without them the engine would
    buffer the streams forever.  Batch form: the identical DataFrame
    expression on static inputs (tested equal)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", delay)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    ).withWatermark("purchase_ts", delay)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
    ).select("purchase_id", "p_user", "purchase_ts", "click_id", "click_ts", "value")


def stream_dedup(events: DataFrame, key: str = "event_id", ts_col: str = "ts",
                 delay: str = "2 hours") -> DataFrame:
    """Streaming exact dedup — the real-time half of the
    ReplacingMergeTree contract (SURVEY §2.E/I4): duplicates arriving
    within the watermark are dropped in-flight
    (dropDuplicatesWithinWatermark keeps state only for ``delay``);
    anything later is absorbed by the batch FINAL view downstream.
    State is bounded: one entry per key seen within the watermark."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([key])
