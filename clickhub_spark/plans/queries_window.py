"""Window functions — SURVEY §2.H.  The reference materializes
lag-style lineage (prev_commit_hash/prev_author/prev_time in
line_changes, reference README.md:184-186); these queries express the
same semantics as runtime windows.

Determinism discipline: `rank()` for tie-inclusive top-N (same rank →
same output set on any engine); `row_number()` only over orderings
made total with a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(rank() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC) AS INT) AS rnk
        FROM orders
    ) WHERE rnk <= 5
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() per partition (SURVEY §2.H1) — top-5 orders by value
    within each priority class, ties included."""
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rnk", F.rank().over(w).cast("int"))
        .where(F.col("rnk") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "q_win_lag",
    oracle="""
    SELECT user_id, event_id, value,
           ROUND(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 4) AS delta
    FROM events
    """,
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — previous event value per user (≙ the precomputed
    prev_* columns, reference README.md:184-186)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("delta", F.round(F.col("value") - F.lag("value").over(w), 4))
        .select("user_id", "event_id", "value", "delta")
    )


@query(
    "q_win_running",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS moving_avg5
    FROM events
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 5-row moving average (SURVEY §2.H3)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    mov = w.rowsBetween(-4, 0)
    return (
        load(spark, sf_dir, "events")
        .withColumn("running_total", F.round(F.sum("value").over(run), 2))
        .withColumn("moving_avg5", F.round(F.avg("value").over(mov), 4))
        .select("user_id", "event_id", "running_total", "moving_avg5")
    )


@query(
    "q_win_range",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id
               ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS sum_1h
    FROM events
    """,
)
def q_win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame — sum of values in the trailing hour per user
    (SURVEY §2.H4).  Both engines order by floored epoch seconds so
    peer/range semantics match exactly."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("sum_1h", F.round(F.sum("value").over(w), 2))
        .select("user_id", "event_id", "sum_1h")
    )


@query(
    "q_win_topn_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               rank() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC) AS rnk
        FROM part
    ) WHERE rnk <= 3
    """,
)
def q_win_topn_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group (SURVEY §2.H5): 3 priciest parts per brand."""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        load(spark, sf_dir, "part")
        .withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT p_partkey,
           ROUND(cume_dist() OVER w, 4) AS cdist,
           nth_value(p_partkey, 2) OVER w AS second_cheapest
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (SURVEY §2.H5 completion):
    cume_dist percentile position + nth_value over a total per-brand
    ordering (unique tiebreaker keeps both engines on one row set).

    cume_dist needs the default RANGE frame while nth_value needs the
    full partition, so the two share a partition/order but use their
    own frames — still ONE window sort in the plan."""
    base = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.cume_dist().over(base), 4).alias("cdist"),
        F.nth_value("p_partkey", 2).over(full).alias("second_cheapest"),
    )
