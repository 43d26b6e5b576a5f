"""Structured Streaming ≡ batch equivalence (SURVEY §5.2, §7 M7):
the streaming MV drained with availableNow must equal the batch
oracle-checked query."""

import pytest

from clickhub_spark.catalog import load
from clickhub_spark.streaming.mv import (
    read_event_stream,
    stream_dedup,
    stream_stream_join,
    run_available_now,
    session_counts,
    stars_mv,
    tumbling_counts,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Materialize events (ns→µs converted) as a stream source dir,
    split into multiple files to exercise multi-trigger ingestion."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def _batch_events(spark):
    return load(spark, SF_DIR, "events")


def test_stars_mv_stream_equals_batch(spark, events_stream_dir, tmp_path):
    schema = _batch_events(spark).schema
    stream = read_event_stream(spark, events_stream_dir, schema, max_files=2)
    got = run_available_now(stars_mv(stream), str(tmp_path / "ck1"))
    expect = stars_mv(_batch_events(spark))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_tumbling_stream_equals_batch(spark, events_stream_dir, tmp_path):
    schema = _batch_events(spark).schema
    stream = read_event_stream(spark, events_stream_dir, schema, max_files=2)
    got = run_available_now(tumbling_counts(stream), str(tmp_path / "ck2"))
    expect = tumbling_counts(_batch_events(spark))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_session_stream_runs_and_covers_all_users(spark, events_stream_dir, tmp_path):
    schema = _batch_events(spark).schema
    stream = read_event_stream(spark, events_stream_dir, schema, max_files=2)
    got = run_available_now(session_counts(stream), str(tmp_path / "ck3"))
    rows = got.collect()
    assert sum(r.n_events for r in rows) == _batch_events(spark).count()
    assert {r.user_id for r in rows} == {
        r.user_id for r in _batch_events(spark).select("user_id").distinct().collect()
    }


def test_stream_stream_join_equals_batch(spark, events_stream_dir, tmp_path):
    """Purchases joined to preceding clicks: streaming (watermarked
    stream-stream join, append mode) must equal the same expression
    on static inputs."""
    ev = _batch_events(spark)
    schema = ev.schema
    stream = read_event_stream(spark, events_stream_dir, schema, max_files=2)
    s_clicks = stream.where("event_type = 'click'")
    s_purch = stream.where("event_type = 'purchase'")
    # replaying a month of history in arbitrary file order: the
    # watermark must cover the whole span or rows arriving "late"
    # relative to earlier batches are expired (correct streaming
    # semantics, but not what this equality test is probing)
    joined = stream_stream_join(s_clicks, s_purch, delay="40 days")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM ssj_sink").collect()))
    b_clicks = ev.where("event_type = 'click'")
    b_purch = ev.where("event_type = 'purchase'")
    expect = sorted(map(tuple, stream_stream_join(b_clicks, b_purch, delay="40 days").collect()))
    assert got == expect
    assert len(got) > 0


def test_stream_static_enrichment_join(spark, events_stream_dir, tmp_path):
    """Stream-static join: streaming events enriched with a static
    dimension (no watermark needed on the static side)."""
    ev = _batch_events(spark)
    segments = spark.createDataFrame(
        [(i, f"seg{i % 3}") for i in range(15)], "user_id long, segment string"
    )
    stream = read_event_stream(spark, events_stream_dir, ev.schema, max_files=2)
    enriched = (
        stream.join(segments, "user_id")
        .groupBy("segment")
        .count()
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_en"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM enrich_sink").collect()))
    expect = sorted(map(tuple, ev.join(segments, "user_id").groupBy("segment").count().collect()))
    assert got == expect


def test_stream_dedup_drops_in_flight_duplicates(spark, tmp_path):
    """A stream carrying every event twice dedups to the distinct set
    (the streaming ReplacingMergeTree path)."""
    ev = load(spark, SF_DIR, "events")
    doubled_dir = str(tmp_path / "doubled")
    ev.unionByName(ev).repartition(4).write.parquet(doubled_dir)
    stream = read_event_stream(spark, doubled_dir, ev.schema, max_files=2)
    deduped = stream_dedup(stream, delay="40 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS nd FROM dedup_sink").first()
    assert got.n == ev.count()      # every event exactly once
    assert got.nd == got.n
