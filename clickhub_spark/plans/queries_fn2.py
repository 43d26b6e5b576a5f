"""Extended function surface — higher-order array fns (ClickHouse
arrayMap/arrayFilter/arraySum ≙ Spark transform/filter/aggregate),
bitwise ops, cross join, ordered collect aggregates (groupArray).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query


@query(
    "q_fn_higher_order",
    oracle="""
    SELECT vec_id,
           ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x * x)), 4) AS norm_sq,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]),
                                x -> x > 0)) AS INT) AS n_positive,
           ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 4) AS max_dim
    FROM embeddings
    """,
)
def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (≙ ClickHouse arrayMap/arrayFilter/
    arraySum/arrayMax over Array columns, SURVEY §2.G5 extension) —
    all lambda expressions stay inside codegen, no UDF."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("norm_sq"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max(vec), 4).alias("max_dim"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS xored,
           event_id << 2 AS shifted_l,
           event_id >> 3 AS shifted_r
    FROM events
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (≙ ClickHouse bitAnd/bitOr/bitXor/bitShift*,
    used for flag fields and hash bucketing)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.expr("shiftleft(event_id, 2)").alias("shifted_l"),
        F.expr("shiftright(event_id, 3)").alias("shifted_r"),
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT a.r_name AS name_a, b.r_name AS name_b
    FROM region a CROSS JOIN region b
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN of tiny inputs (SURVEY §2.C parity; at
    scale cross joins are only ever dim×dim — Catalyst would reject an
    accidental fact×fact via spark.sql.crossJoin checks)."""
    r = load(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_name").alias("name_b"))
    return a.crossJoin(b)


@query(
    "q_agg_collect",
    oracle="""
    SELECT l_suppkey,
           string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags,
           CAST(COUNT(DISTINCT l_returnflag) AS INT) AS n_flags
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArray/groupUniqArray ≙ collect_set, emitted as a sorted
    joined string so the value is deterministic across partitionings
    and engines (SURVEY §2.G5 aggregate form)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias("flags"),
            F.size(F.collect_set("l_returnflag")).alias("n_flags"),
        )
    )
