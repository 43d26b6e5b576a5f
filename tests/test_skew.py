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


def test_salted_join_equals_plain_join(spark):
    """Salted join must be value-identical to the plain join on skewed
    data (one key holding most rows)."""
    from pyspark.sql import functions as F

    from clickhub_spark.operators.skew import salted_join

    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3)], "k string, w int"
    )
    plain = big.join(small, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_join(big, small, ["k"]).groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_join(spark):
    import pytest
    from clickhub_spark.operators.skew import salted_join

    df = spark.range(1).selectExpr("id AS k")
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="right")


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's built-in skew-join handling (the no-code-change
    complement to salted_join) must actually engage: a 90%-hot key
    under a forced SortMergeJoin gets its partition split at runtime —
    SortMergeJoin(skew=true) with an AQEShuffleRead marked skewed.
    Production thresholds (256 MB) are correct for real scale; the
    test lowers them to reproduce the decision on toy data.  The plan
    must be read from the EXECUTED DataFrame's own QueryExecution —
    derived actions like count() run a different plan."""
    import pyspark.sql.functions as F

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    old = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        big = spark.range(400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.rand(1).alias("v"),
        )
        small = spark.range(50_000).select(
            F.col("id").alias("k"), F.lit("x").alias("s")
        )
        joined = big.join(small, "k")
        assert len(joined.collect()) == 365_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
