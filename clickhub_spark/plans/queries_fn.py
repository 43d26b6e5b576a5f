"""Scalar function families — SURVEY §2.G.  One oracle-checked query
per family, each exercising several functions over the columns the
reference schema would run them on (message/path/body analogs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query


@query(
    "q_fn_string",
    oracle="""
    SELECT doc_id,
           upper(substr(text, 1, 10)) AS head_upper,
           CAST(length(text) AS INT) AS n_chars_fn,
           CAST(strpos(text, 'data') AS INT) AS data_pos,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word,
           (text LIKE '%merge%') AS has_merge,
           concat(lang, ':', source) AS lang_source
    FROM documents
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/substring/length/instr/regexp_extract/like/
    concat (≙ ClickHouse upper/substring/position/extract/like/concat
    over message/path/body, SURVEY §2.G1)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.length("text").alias("n_chars_fn"),
        F.instr(F.col("text"), "data").alias("data_pos"),
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.col("text").like("%merge%").alias("has_merge"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(dayofmonth(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           CAST(ts AS DATE) AS event_date,
           CAST(datediff('day', CAST(ts AS DATE), DATE '2024-03-01') AS INT) AS days_to_march
    FROM events
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: toYear/toMonth/toStartOfWeek/toDate/dateDiff
    analogs (≙ ClickHouse date fns over time/created_at, SURVEY §2.G2)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("week", F.col("ts")).alias("week_start"),
        F.to_date("ts").alias("event_date"),
        F.datediff(F.lit("2024-03-01").cast("date"), F.to_date("ts")).alias("days_to_march"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           ROUND(abs(l_discount - 0.05), 4) AS disc_dev,
           l_orderkey // 100 AS order_bucket,
           l_orderkey % 7 AS order_mod
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/abs/intDiv/modulo/arithmetic (≙
    ClickHouse math fns over the lines_* metrics, SURVEY §2.G3)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.expr("l_orderkey div 100").alias("order_bucket"),
        (F.col("l_orderkey") % 7).alias("order_mod"),
    )


@query(
    "q_fn_cond",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 80 THEN 'high'
                WHEN value >= 40 THEN 'mid'
                ELSE 'low' END AS tier,
           coalesce(nullif(event_type, 'error'), 'UNKNOWN') AS safe_type
    FROM events
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: multiIf ≙ chained when/otherwise, coalesce,
    nullIf (SURVEY §2.G4)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") >= 80, "high")
        .when(F.col("value") >= 40, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("UNKNOWN")).alias(
            "safe_type"
        ),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT w AS word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY cnt DESC, word ASC
    LIMIT 20
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split + arrayJoin(explode) + group (≙ ClickHouse
    arrayJoin over labels/assignees, SURVEY §2.G5) — word frequency
    top-20 with a total ordering (word is unique tiebreak)."""
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(20)
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: JSONExtract ≙ get_json_object over the events.props
    JSON string column (SURVEY §2.G6)."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
    )


@query(
    "q_fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256,
           substr(md5(lang), 1, 8) AS lang_bucket
    FROM documents
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encode family: cityHash64-class content hashing ≙ md5/sha2
    (SURVEY §2.G7; engine-portable hashes — xxhash64 is used engine-
    internally for bucketing/minhash where no oracle is needed)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.substring(F.md5("lang"), 1, 8).alias("lang_bucket"),
    )


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://github.com/' || source || '/' || lang
                   || '?doc=' || doc_id || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]doc=([^&#]*)', 1) AS doc_param
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL functions (ClickHouse protocol/domain/path/
    extractURLParameter) via Spark's parse_url — JVM builtin, no UDF;
    URLs synthesized deterministically from documents columns."""
    u = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://github.com/"),
            F.col("source"),
            F.lit("/"),
            F.col("lang"),
            F.lit("?doc="),
            F.col("doc_id"),
            F.lit("&v=2"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("doc")).alias("doc_param"),
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           ROUND(value, 4) AS v_value,
           event_type AS v_type
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse JSON/Object-type analog via Spark 4 VariantType
    (SURVEY §2.G6 extension): the props JSON column is parsed into a
    semi-structured ``parse_json`` variant and fields are extracted
    with typed ``variant_get`` paths; a second variant is built from
    row values (to_json → parse_json) and round-tripped back out, so
    the oracle checks the whole encode/decode against the original
    columns.  What this query demonstrates: typed extraction from a
    binary-encoded variant plus a lossless build/extract round-trip.
    (It parses the JSON string at scan time — parse-once-store-variant
    and parquet variant shredding/pushdown are NOT exercised or
    plan-tested here; storing the parsed variant in parquet is the
    scale path for repeated querying of schemaless columns.)"""
    ev = load(spark, sf_dir, "events")
    props_v = F.parse_json("props")
    row_v = F.parse_json(F.to_json(F.struct("value", "event_type")))
    return ev.select(
        "event_id",
        F.variant_get(props_v, "$.k", "bigint").alias("k"),
        F.round(F.variant_get(row_v, "$.value", "double"), 4).alias("v_value"),
        F.variant_get(row_v, "$.event_type", "string").alias("v_type"),
    )
