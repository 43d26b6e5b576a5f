"""GraphiteMergeTree-style retention rollup (SURVEY §2.E family —
age-tiered time-bucket downsampling, reference README.md:132-134
engine family)."""

from datetime import datetime

from clickhub_spark.operators.retention import optimize_rollup, rollup_retention

_ROWS = [
    # (metric, ts, v) — one recent hour, one mid-age, two old same-day
    ("m1", datetime(2024, 1, 28, 10, 15), 1.0),
    ("m1", datetime(2024, 1, 28, 10, 45), 2.0),   # same 1h bucket
    ("m1", datetime(2024, 1, 28, 11, 5), 4.0),    # next 1h bucket
    ("m1", datetime(2024, 1, 20, 3, 0), 8.0),     # 6h tier
    ("m1", datetime(2024, 1, 5, 1, 0), 16.0),     # 1d tier
    ("m1", datetime(2024, 1, 5, 23, 0), 32.0),    # same 1d bucket
    ("m2", datetime(2024, 1, 28, 10, 20), 100.0), # keys independent
]
_TIERS = [("2024-01-25 00:00:00", 3600), ("2024-01-11 00:00:00", 21600)]


def _df(spark):
    return spark.createDataFrame(_ROWS, "k string, ts timestamp, v double")


def test_rollup_tiers_and_buckets(spark):
    out = {
        (r.k, r.bucket_s, r.bucket_start): (r.n, r.total)
        for r in rollup_retention(
            _df(spark), "ts", ["k"], "v", _TIERS, 86400
        ).collect()
    }
    def es(*a):
        import calendar
        return calendar.timegm(datetime(*a).timetuple())
    # 1h tier: two rows fold, the 11:05 row is its own bucket
    assert out[("m1", 3600, es(2024, 1, 28, 10))] == (2, 3.0)
    assert out[("m1", 3600, es(2024, 1, 28, 11))] == (1, 4.0)
    # 6h tier: 03:00 lands in the 00:00-06:00 bucket
    assert out[("m1", 21600, es(2024, 1, 20, 0))] == (1, 8.0)
    # 1d tier: both Jan-5 rows fold
    assert out[("m1", 86400, es(2024, 1, 5, 0))] == (2, 48.0)
    assert out[("m2", 3600, es(2024, 1, 28, 10))] == (1, 100.0)
    assert len(out) == 5


def test_optimize_rollup_rewrites_and_pair_remerges(spark, tmp_path):
    """Physical merge: the table becomes its rollup; re-rolling the
    n/total pair with a coarser rule set aggregates correctly (the
    mergeable-pair contract — no materialized mean to corrupt)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "metrics")
    _df(spark).write.parquet(path)
    n = optimize_rollup(spark, path, "ts", ["k"], "v", _TIERS, 86400,
                        target_files=1)
    assert n == 5
    rolled = spark.read.parquet(path)
    assert {c for c in rolled.columns} == {"k", "bucket_s", "bucket_start", "n", "total"}
    # re-roll to one coarse bucket per key: sums of sums, counts of counts
    re = (
        rolled.groupBy("k")
        .agg(F.sum("n").alias("n"), F.round(F.sum("total"), 2).alias("total"))
        .collect()
    )
    got = {(r.k): (r.n, r.total) for r in re}
    assert got == {"m1": (6, 63.0), "m2": (1, 100.0)}


def test_misordered_tiers_raise(spark):
    """Oldest-first tiers would silently coarsen the newest data (and
    optimize_rollup would then destroy it) — must fail loudly."""
    import pytest as _pytest

    bad = [("2024-01-11 00:00:00", 21600), ("2024-01-25 00:00:00", 3600)]
    with _pytest.raises(ValueError, match="newest-first"):
        rollup_retention(_df(spark), "ts", ["k"], "v", bad, 86400)


def test_optimize_rollup_is_terminal(spark, tmp_path):
    """Re-running the physical rollup on its own output raises instead
    of silently double-rolling (ts/value are gone from the schema)."""
    import pytest as _pytest

    path = str(tmp_path / "metrics")
    _df(spark).write.parquet(path)
    optimize_rollup(spark, path, "ts", ["k"], "v", _TIERS, 86400)
    with _pytest.raises(Exception):
        optimize_rollup(spark, path, "ts", ["k"], "v", _TIERS, 86400)
    # the failed second run must not have destroyed the table
    assert spark.read.parquet(path).count() == 5


def test_pre_1970_timestamps_floor_like_the_oracle(spark):
    """Negative epochs must FLOOR (round toward -inf), matching the
    oracle's FLOOR(es / bucket_s) * bucket_s — a cast("long") on the
    double division truncates toward ZERO and would put 23:00 on
    1969-12-31 (epoch -3600) in bucket 0 instead of -86400 (the
    r8 latent fixed in round 9; ADVICE retention.py:75)."""
    rows = [
        ("m", datetime(1969, 12, 31, 23, 0), 1.0),   # epoch -3600
        ("m", datetime(1969, 12, 31, 1, 0), 2.0),    # epoch -82800
        ("m", datetime(1970, 1, 1, 1, 0), 4.0),      # epoch 3600
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    # one all-history tier: 1-day buckets for everything
    out = {
        r.bucket_start: (r.n, r.total)
        for r in rollup_retention(
            df, "ts", ["k"], "v", [("2100-01-01 00:00:00", 3600)], 86400
        ).collect()
    }
    # both 1969 rows floor into the [-86400, 0) day bucket; the 1970
    # row floors into [0, 86400)
    assert out == {-86400: (2, 3.0), 0: (1, 4.0)}
