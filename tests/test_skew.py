"""Salted two-phase aggregation equals the direct aggregate."""

from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.operators.skew import explode_small_side, salted_agg

from tests.conftest import SF_DIR


def test_salted_agg_matches_direct(spark):
    ev = load(spark, SF_DIR, "events")
    direct = {
        (r.user_id): (r.n, round(r.v, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    salted = {
        (r.user_id): (r.n, round(r.v, 2))
        for r in salted_agg(
            ev,
            ["user_id"],
            [F.count("*").alias("n"), F.sum("value").alias("v")],
            [F.sum("n").alias("n"), F.sum("v").alias("v")],
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_plain(spark):
    big = load(spark, SF_DIR, "events").select("user_id", "value")
    dim = spark.createDataFrame(
        [(i, f"seg{i % 3}") for i in range(15)], "user_id long, segment string"
    )
    plain = big.join(dim, "user_id").groupBy("segment").count()
    salted_dim = explode_small_side(dim, salt_buckets=8)
    salted_big = big.withColumn("__salt", (F.rand(seed=1) * 8).cast("int"))
    salted = (
        salted_big.join(salted_dim, ["user_id", "__salt"]).groupBy("segment").count()
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
