"""Streaming ingest: checkpointed file-source appends + FINAL-view
replay tolerance (the reference's append + ReplacingMergeTree loop)."""

from clickhub_spark.catalog import load
from clickhub_spark.operators.dedup import final_view
from clickhub_spark.sources.writer import compact
from clickhub_spark.streaming.ingest import stream_ingest

from tests.conftest import SF_DIR


def test_stream_ingest_then_checkpoint_skips_replay(spark, tmp_path):
    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "landing")
    ev.repartition(4).write.parquet(src)
    table = str(tmp_path / "events_tbl")
    ck = str(tmp_path / "ck")

    stream_ingest(spark, src, ev.schema, table, ck, max_files=2)
    stored = spark.read.parquet(table)
    assert stored.count() == ev.count()
    assert "updated_at" in stored.columns  # ingest-time stamp applied

    # second run with the SAME checkpoint: no files left to process
    stream_ingest(spark, src, ev.schema, table, ck, max_files=2)
    assert spark.read.parquet(table).count() == ev.count()

    # a FRESH checkpoint replays everything (at-least-once) — the
    # FINAL view must absorb the duplicates, reference README.md:133
    stream_ingest(spark, src, ev.schema, table, str(tmp_path / "ck2"), max_files=2)
    doubled = spark.read.parquet(table)
    assert doubled.count() == 2 * ev.count()
    finals = final_view(
        doubled, keys=["event_id"], version=["updated_at", "ts"]
    )
    assert finals.count() == ev.count()


def test_compact_preserves_rows_reduces_files(spark, tmp_path):
    import glob
    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "landing")
    ev.repartition(6).write.parquet(src)
    table = str(tmp_path / "tbl")
    stream_ingest(spark, src, ev.schema, table, str(tmp_path / "ck"), max_files=1)
    before = len(glob.glob(table + "/*.parquet"))
    n = compact(spark, table, ["ts"], target_files=2)
    after = len(glob.glob(table + "/*.parquet"))
    assert n == ev.count()
    assert spark.read.parquet(table).count() == n
    assert after <= 2 < before
