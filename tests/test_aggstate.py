"""Mergeable aggregate states (AggregatingMergeTree analog): merge ≡
global, bounded error vs exact, and append-then-merge ≡ rebuild."""

from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.operators.aggstate import (
    merge_uniq_state,
    uniq_state,
    write_uniq_state,
)

from tests.conftest import SF_DIR


def test_merged_partials_equal_global_sketch(spark):
    """uniqMerge over (event_type, day) partials must give the same
    estimate as one global sketch per event_type — state merging loses
    nothing (the property that makes rollups rescan-free)."""
    ev = load(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    via_partials = {
        r.event_type: r.uniq_est
        for r in uniq_state(ev, ["event_type", "day"], "user_id")
        .groupBy("event_type")
        .agg(F.hll_union_agg("uniq_state").alias("u"))
        .select("event_type", F.hll_sketch_estimate("u").cast("long").alias("uniq_est"))
        .collect()
    }
    direct = {
        r.event_type: r.uniq_est
        for r in uniq_state(ev, ["event_type"], "user_id")
        .select(
            "event_type",
            F.hll_sketch_estimate("uniq_state").cast("long").alias("uniq_est"),
        )
        .collect()
    }
    assert via_partials == direct


def test_estimate_within_hll_error_of_exact(spark):
    ev = load(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r.event_type: r.uniq_est
        for r in uniq_state(ev, ["event_type"], "user_id")
        .select(
            "event_type",
            F.hll_sketch_estimate("uniq_state").cast("long").alias("uniq_est"),
        )
        .collect()
    }
    for etype, n in exact.items():
        assert abs(est[etype] - n) <= max(2, 0.05 * n), (etype, est[etype], n)


def test_append_then_merge_equals_rebuild(spark, tmp_path):
    """Two batches written independently then merged must equal the
    single-pass state over all rows — the incremental-ingest contract."""
    ev = load(spark, SF_DIR, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "partials")
    write_uniq_state(a, path, ["event_type"], "user_id")
    write_uniq_state(b, path, ["event_type"], "user_id")

    merged = {r.event_type: r.uniq_est for r in merge_uniq_state(spark, path, ["event_type"]).collect()}
    rebuilt = {
        r.event_type: r.uniq_est
        for r in uniq_state(ev, ["event_type"], "user_id")
        .select(
            "event_type",
            F.hll_sketch_estimate("uniq_state").cast("long").alias("uniq_est"),
        )
        .collect()
    }
    assert merged == rebuilt
    # grand-total rollup from the same stored partials, no group cols
    total = merge_uniq_state(spark, path).first().uniq_est
    exact_total = ev.agg(F.countDistinct("user_id")).first()[0]
    assert abs(total - exact_total) <= max(2, 0.05 * exact_total)
