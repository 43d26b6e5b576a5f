"""Snapshot versioning / time travel (operators/mutate snapshot
layer): old versions immutable under later mutations, pointer flips
atomic, retention never drops the current version."""

import os

import pytest
from pyspark.sql import functions as F

from clickhub_spark.operators.mutate import (
    current_version,
    prune_snapshots,
    read_snapshot,
    snapshot_mutate,
    snapshot_write,
)


@pytest.fixture()
def table(spark, tmp_path):
    d = str(tmp_path / "tt")
    os.makedirs(d)
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    assert snapshot_write(df, d) == 0
    return d


def test_versions_accumulate_and_old_reads_are_stable(spark, table):
    v0_before = sorted(r.k for r in read_snapshot(spark, table, 0).collect())
    assert snapshot_mutate(spark, table, lambda df: df.where(F.col("k") < 50)) == 1
    assert (
        snapshot_mutate(
            spark, table, lambda df: df.withColumn("v", F.col("v") + 1)
        )
        == 2
    )
    assert current_version(table) == 2
    # v0 unchanged after two later mutations
    assert sorted(r.k for r in read_snapshot(spark, table, 0).collect()) == v0_before
    assert read_snapshot(spark, table, 1).count() == 50
    assert read_snapshot(spark, table).agg(F.min("v")).first()[0] == 1
    # default read == current version
    assert read_snapshot(spark, table).count() == 50


def test_read_missing_version_raises(spark, table):
    with pytest.raises(ValueError):
        read_snapshot(spark, table, 7)
    with pytest.raises(ValueError):
        read_snapshot(spark, str(table) + "_nope")


def test_prune_keeps_newest_and_current(spark, table):
    for i in range(4):
        snapshot_mutate(spark, table, lambda df: df.where(F.col("k") >= 0))
    assert current_version(table) == 4
    removed = prune_snapshots(table, keep=2)
    assert removed == 3
    # newest two readable, older gone
    assert read_snapshot(spark, table, 4).count() == 100
    assert read_snapshot(spark, table, 3).count() == 100
    with pytest.raises(ValueError):
        read_snapshot(spark, table, 0)


def test_pointer_survives_partial_build(spark, table, tmp_path):
    # a crashed build (version dir half-written, pointer never
    # flipped) must leave the table at the previous version
    import shutil

    from clickhub_spark.operators.mutate import _snap_path

    fake_build = _snap_path(table, 1) + ".__build_dead"
    os.makedirs(fake_build)
    with open(os.path.join(fake_build, "junk.parquet"), "w") as f:
        f.write("not parquet")
    assert current_version(table) == 0
    assert read_snapshot(spark, table).count() == 100
    # the next real mutation publishes v1 normally
    assert snapshot_mutate(spark, table, lambda df: df.limit(10)) == 1
    assert read_snapshot(spark, table).count() == 10
    shutil.rmtree(fake_build, ignore_errors=True)


def test_diff_sees_added_and_dropped_columns(spark, table):
    from clickhub_spark.operators.mutate import snapshot_diff

    # v1 adds a column: every row must surface as an update (the
    # backfill a CDC consumer replays)
    snapshot_mutate(
        spark, table, lambda df: df.withColumn("flag", F.col("k") % 2 == 0)
    )
    d = snapshot_diff(spark, table, 0, 1, keys=["k"])
    assert d.where(F.col("change_type") == "update").count() == 100
    # reverse direction (column dropped) must not crash
    d2 = snapshot_diff(spark, table, 1, 0, keys=["k"])
    assert d2.where(F.col("change_type") == "update").count() == 100


def test_prune_ignores_stale_build_dirs(spark, table):
    import os as _os

    from clickhub_spark.operators.mutate import _SNAPDIR

    for _ in range(2):
        snapshot_mutate(spark, table, lambda df: df.where(F.col("k") >= 0))
    # a crashed write's leftover build dir must not occupy a keep slot
    stale = _os.path.join(table, _SNAPDIR, "v00000009.__build_dead")
    _os.makedirs(stale)
    assert prune_snapshots(table, keep=2) == 1  # only v0 removed
    assert not _os.path.exists(stale)  # swept
    assert read_snapshot(spark, table, 1).count() == 100  # kept
    with pytest.raises(ValueError):
        read_snapshot(spark, table, 0)


def test_rewrite_crash_recovery(spark, tmp_path):
    import os as _os

    from clickhub_spark.operators.mutate import delete_where, recover_table

    path = str(tmp_path / "cow")
    spark.range(50).withColumnRenamed("id", "k").write.parquet(path)
    # simulate a crash between the two swap renames: table dir moved
    # to the FIXED .__old name, new data never landed
    _os.rename(path, path + ".__old")
    assert recover_table(path) is True
    assert spark.read.parquet(path).count() == 50
    # the next mutation recovers automatically too
    _os.rename(path, path + ".__old")
    remaining = delete_where(spark, path, F.col("k") < 10)
    assert remaining == 40


def test_prune_keep_zero_retains_only_current(spark, table):
    # ADVICE r5: keep=0 used to short-circuit to "remove nothing";
    # it must mean "retain only the current version"
    for _ in range(3):
        snapshot_mutate(spark, table, lambda df: df.where(F.col("k") >= 0))
    assert current_version(table) == 3
    removed = prune_snapshots(table, keep=0)
    assert removed == 3  # v0..v2 gone, current v3 survives
    assert read_snapshot(spark, table, 3).count() == 100
    with pytest.raises(ValueError):
        read_snapshot(spark, table, 2)
    with pytest.raises(ValueError):
        prune_snapshots(table, keep=-1)
