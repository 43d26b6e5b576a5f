"""As-of join semantics (SURVEY §2.C8)."""

from datetime import datetime

from clickhub_spark.operators.asof import asof_join


def test_asof_backward_with_equal_ts_visible(spark):
    left = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 12, 0), 1),
         ("u1", datetime(2024, 1, 1, 10, 0), 2),
         ("u2", datetime(2024, 1, 1, 12, 0), 3)],
        "user string, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 11, 0), 100.0),
         ("u1", datetime(2024, 1, 1, 12, 0), 200.0),  # equal ts → visible
         ("u1", datetime(2024, 1, 1, 13, 0), 300.0)],
        "user string, ts timestamp, price double",
    )
    out = {r.lid: (r.asof_price, r.asof_ts) for r in asof_join(
        left, right, on=["user"], left_ts="ts", right_ts="ts",
        right_values=["price"]).collect()}
    assert out[1] == (200.0, datetime(2024, 1, 1, 12, 0))  # exact match wins
    assert out[2] == (None, None)  # nothing at or before 10:00
    assert out[3] == (None, None)  # no right rows for u2


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 12, 0), 1)], "user string, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 9, 0), 5.0)], "user string, ts timestamp, price double"
    )
    hit = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_values=["price"], tolerance=4 * 3600).first()
    miss = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                     right_values=["price"], tolerance=3600).first()
    assert hit.asof_price == 5.0
    assert miss.asof_price is None


def test_point_in_interval_join_boundaries(spark):
    """Half-open [start, end): boundary points land exactly once, and
    intervals spanning bin edges still match points in later bins."""
    from clickhub_spark.operators.rangejoin import point_in_interval_join

    pts = spark.createDataFrame([(0,), (5,), (9,), (10,), (23,)], "p long")
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 24), (3, 10, 11)], "iv_id long, s long, e long"
    )
    got = {
        (r.iv_id, r.p)
        for r in point_in_interval_join(pts, iv, "p", "s", "e", bin_width=7).collect()
    }
    assert got == {
        (1, 0), (1, 5), (1, 9),          # 10 excluded (half-open)
        (2, 5), (2, 9), (2, 10), (2, 23),  # spans 4 bins
        (3, 10),
    }


def test_asof_tolerance_on_ntz_timestamps(spark):
    """timestamp_ntz inputs (how Spark reads timestamp[us] parquet
    without tz) must work through the tolerance path — NTZ refuses a
    direct numeric cast."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampNTZType,
    )

    sch = StructType([
        StructField("user", LongType()),
        StructField("ts", TimestampNTZType()),
    ])
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0 + dt.timedelta(seconds=100))], sch)
    right = spark.createDataFrame(
        [(1, t0)], sch
    ).withColumn("price", F.lit(5.0))
    hit = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_values=["price"], tolerance=200).collect()[0]
    assert hit.asof_price == 5.0
    miss = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                     right_values=["price"], tolerance=50).collect()[0]
    assert miss.asof_price is None


def test_asof_forward_direction(spark):
    """Forward as-of: earliest right at-or-after each left row; exact
    ties match; tolerance measures forward."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 100)], "id long, ts long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(20,), (25,), (60,)], "ts long"
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn("k", F.lit(1))
    l2 = left.withColumn("k", F.lit(1))
    out = {
        r.id: r.asof_ts
        for r in asof_join(
            l2, right, on=["k"], left_ts="ts", right_ts="ts",
            right_values=[], direction="forward",
        ).collect()
    }
    assert out[1].timestamp() == 20  # earliest at-or-after 10
    assert out[2].timestamp() == 25  # exact tie matches
    assert out[3] is None            # nothing after 100
    tol = {
        r.id: r.asof_ts
        for r in asof_join(
            l2, right, on=["k"], left_ts="ts", right_ts="ts",
            right_values=[], direction="forward", tolerance=5,
        ).collect()
    }
    assert tol[1] is None            # 20 is 10s ahead, > 5s tolerance
    assert tol[2].timestamp() == 25


def test_asof_nearest_direction(spark):
    left = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 12, 0), 1),   # back 11:30 (30m) vs fwd 12:10 (10m) -> fwd
         ("u1", datetime(2024, 1, 1, 11, 40), 2),  # back 11:30 (10m) vs fwd 12:10 (30m) -> back
         ("u1", datetime(2024, 1, 1, 11, 50), 3),  # tie 10m both sides -> backward preferred
         ("u2", datetime(2024, 1, 1, 9, 0), 4),    # only forward exists
         ("u3", datetime(2024, 1, 1, 9, 0), 5)],   # no right rows
        "user string, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 11, 30), 100.0),
         ("u1", datetime(2024, 1, 1, 12, 10), 200.0),
         ("u2", datetime(2024, 1, 1, 10, 0), 300.0)],
        "user string, ts timestamp, price double",
    )
    out = {r.lid: (r.asof_price, r.asof_ts) for r in asof_join(
        left, right, on=["user"], left_ts="ts", right_ts="ts",
        right_values=["price"], direction="nearest").collect()}
    assert out[1] == (200.0, datetime(2024, 1, 1, 12, 10))
    assert out[2] == (100.0, datetime(2024, 1, 1, 11, 30))
    assert out[3] == (100.0, datetime(2024, 1, 1, 11, 30))  # tie -> backward
    assert out[4] == (300.0, datetime(2024, 1, 1, 10, 0))
    assert out[5] == (None, None)


def test_asof_nearest_exact_match_and_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 12, 0), 1),
         ("u1", datetime(2024, 1, 1, 18, 0), 2)],  # nearest is 6h away
        "user string, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 12, 0), 100.0),
         ("u1", datetime(2024, 1, 1, 12, 5), 200.0)],
        "user string, ts timestamp, price double",
    )
    out = {r.lid: (r.asof_price,) for r in asof_join(
        left, right, on=["user"], left_ts="ts", right_ts="ts",
        right_values=["price"], direction="nearest",
        tolerance=3600).collect()}
    assert out[1] == (100.0,)  # exact match beats the 5-min forward one
    assert out[2] == (None,)   # beyond tolerance -> null
