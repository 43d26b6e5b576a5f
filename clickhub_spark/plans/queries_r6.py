"""Round-6 query wave — per-segment statistical tests and other
operators added this round.

The per-segment rank statistics (VERDICT r5 item 6) are the form a
real analyst runs — KS / Mann-Whitney per experiment bucket — and
they exercise the PARTITIONED window path the pooled canon can't:
``Window.partitionBy(seg).orderBy(value)`` distributes one sorted
run per segment, no Exchange SinglePartition anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query


def _pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view-vs-click sample with a 10-way experiment segment."""
    return (
        load(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "click") & F.col("value").isNotNull()
        )
        .select(
            (F.col("user_id") % 10).alias("seg"),
            "value",
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g1"),
        )
    )


@query(
    "q_agg_ks_test_by",
    oracle="""
    WITH p AS (
        SELECT CAST(user_id % 10 AS BIGINT) AS seg, value,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
        FROM events
        WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ), c AS (
        SELECT seg,
               SUM(g1) OVER (PARTITION BY seg ORDER BY value
                             RANGE BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS c1,
               SUM(1 - g1) OVER (PARTITION BY seg ORDER BY value
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS c2,
               SUM(g1) OVER (PARTITION BY seg) AS n1,
               SUM(1 - g1) OVER (PARTITION BY seg) AS n2
        FROM p
    )
    SELECT seg,
           FLOOR(MAX(ABS(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                         - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                 * 1000000) / 1000000 AS ks_d,
           CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2
    FROM c GROUP BY seg ORDER BY seg
    """,
)
def q_agg_ks_test_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment two-sample Kolmogorov-Smirnov (ClickHouse
    ``kolmogorovSmirnovTest`` grouped by an experiment key — SURVEY
    §2.D stats family, the partitioned sibling of q_agg_ks_test):
    max ECDF gap between 'view' and 'click' value distributions
    within each user bucket.  Every window is partitioned BY SEG, so
    the plan distributes one sorted run per segment — the scale shape
    the pooled canon (which must aggregate per-value counts to avoid
    a global sort) gets for free here.  RANGE frames make tie groups
    contribute all their peers before D is evaluated; the same exact
    integer counts divide on both engines, so FLOOR-scaling (not
    ROUND) suffices."""
    p = _pooled(spark, sf_dir)
    wcum = (
        Window.partitionBy("seg")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wseg = Window.partitionBy("seg")
    c = p.select(
        "seg",
        F.sum("g1").over(wcum).alias("c1"),
        F.sum(1 - F.col("g1")).over(wcum).alias("c2"),
        F.sum("g1").over(wseg).alias("n1"),
        F.sum(1 - F.col("g1")).over(wseg).alias("n2"),
    )
    gap = F.abs(
        F.col("c1").cast("double") / F.col("n1").cast("double")
        - F.col("c2").cast("double") / F.col("n2").cast("double")
    )
    return (
        c.groupBy("seg")
        .agg(
            (F.floor(F.max(gap) * 1000000) / 1000000).alias("ks_d"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
        .orderBy("seg")
    )


@query(
    "q_agg_mannwhitney_by",
    oracle="""
    WITH p AS (
        SELECT CAST(user_id % 10 AS BIGINT) AS seg, value,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
        FROM events
        WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ), r AS (
        SELECT seg, g1,
               RANK() OVER (PARTITION BY seg ORDER BY value)
               + (COUNT(*) OVER (PARTITION BY seg ORDER BY value
                                 RANGE BETWEEN CURRENT ROW
                                 AND CURRENT ROW) - 1) / 2.0 AS avg_rank
        FROM p
    ), s AS (
        SELECT seg,
               CAST(SUM(CASE WHEN g1 = 1 THEN avg_rank END) AS DOUBLE)
                   AS r1,
               CAST(SUM(g1) AS BIGINT) AS n1,
               CAST(SUM(1 - g1) AS BIGINT) AS n2
        FROM r GROUP BY seg
    )
    SELECT seg,
           r1 - n1 * (n1 + 1) / 2.0 AS u1,
           CAST(n1 AS DOUBLE) * n2 - (r1 - n1 * (n1 + 1) / 2.0) AS u2,
           n1, n2
    FROM s ORDER BY seg
    """,
)
def q_agg_mannwhitney_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Mann-Whitney U (ClickHouse ``mannWhitneyUTest``
    grouped by an experiment key — the partitioned sibling of
    q_agg_mannwhitney): tie-averaged midranks of the pooled
    view+click values WITHIN each user bucket, then U1/U2 per
    bucket.  Both windows partition BY SEG — one sorted run per
    segment, fully distributed.  Midranks are integers-or-halves and
    the per-segment sums stay far below 2^53, so every intermediate
    double is exact on both engines — no rounding anywhere."""
    p = _pooled(spark, sf_dir)
    wr = Window.partitionBy("seg").orderBy("value")
    peers = (
        Window.partitionBy("seg")
        .orderBy("value")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    r = p.select(
        "seg",
        "g1",
        (F.rank().over(wr) + (F.count(F.lit(1)).over(peers) - 1) / 2.0).alias(
            "avg_rank"
        ),
    )
    s = r.groupBy("seg").agg(
        F.sum(F.when(F.col("g1") == 1, F.col("avg_rank")))
        .cast("double")
        .alias("r1"),
        F.sum("g1").alias("n1"),
        F.sum(1 - F.col("g1")).alias("n2"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    return s.select(
        "seg",
        u1.alias("u1"),
        (F.col("n1").cast("double") * F.col("n2") - u1).alias("u2"),
        "n1",
        "n2",
    ).orderBy("seg")
