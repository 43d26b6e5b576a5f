"""End-to-end freshness: landing file → streaming ingest → events
table → stars-MV stage → FINAL read view, all on one warehouse —
the reference's insert→MV loop observed across two cycles."""

from pyspark.sql import functions as F

from clickhub_spark.streaming.freshness import EVENTS_SCHEMA, read_stars, refresh


def _land(spark, landing, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)


def _rows(df):
    return {r.user_id: r.stars for r in df.collect()}


def test_event_file_through_ingest_advances_mv(spark, tmp_path):
    import datetime

    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "warehouse")
    ts = datetime.datetime(2025, 1, 1)

    assert _rows(read_stars(spark, f"{wh}/stars")) == {}  # pollable at t=0

    _land(spark, landing, [
        (1, ts, 100, "view", 1.0, "{}"),
        (2, ts, 100, "view", 1.0, "{}"),
        (3, ts, 200, "view", 1.0, "{}"),
        (4, ts, 200, "click", 1.0, "{}"),  # wrong type — not counted
    ])
    assert _rows(refresh(spark, landing, wh)) == {100: 2, 200: 1}

    # second cycle: a NEW landing file must advance the MV
    # incrementally (checkpoints skip everything already processed)
    _land(spark, landing, [
        (5, ts, 100, "view", 1.0, "{}"),
        (6, ts, 300, "view", 1.0, "{}"),
    ])
    assert _rows(refresh(spark, landing, wh)) == {100: 3, 200: 1, 300: 1}

    # idle cycle: nothing new → same view, and no new partial files
    import glob
    n_partials = len(glob.glob(f"{wh}/stars/**/*.parquet", recursive=True))
    assert n_partials > 0
    assert _rows(refresh(spark, landing, wh)) == {100: 3, 200: 1, 300: 1}
    assert len(glob.glob(f"{wh}/stars/**/*.parquet", recursive=True)) == n_partials

    # MV ≡ batch aggregate over the events table (stream/batch parity)
    batch = (
        spark.read.parquet(f"{wh}/events")
        .where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count("*").alias("stars"))
    )
    assert _rows(batch) == {100: 3, 200: 1, 300: 1}


def test_replayed_mv_batch_overwrites_not_doubles(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the partial write
    and the checkpoint commit replays the batch.  Simulate by wiping the
    MV-stage checkpoint (so the SAME events replay under the SAME batch
    ids) — the batch-id-keyed overwrite sink must leave sums unchanged."""
    import datetime
    import shutil

    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "warehouse")
    ts = datetime.datetime(2025, 1, 1)

    _land(spark, landing, [
        (1, ts, 100, "view", 1.0, "{}"),
        (2, ts, 100, "view", 1.0, "{}"),
        (3, ts, 200, "view", 1.0, "{}"),
    ])
    assert _rows(refresh(spark, landing, wh)) == {100: 2, 200: 1}

    # crash-replay: MV checkpoint lost, partials already on disk
    shutil.rmtree(f"{wh}/_ck/stars_mv")
    assert _rows(refresh(spark, landing, wh)) == {100: 2, 200: 1}
