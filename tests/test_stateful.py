"""applyInPandasWithState: state must persist across micro-batches and
converge to the batch aggregate."""

from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.streaming.mv import read_event_stream
from clickhub_spark.streaming.stateful import running_user_totals

from tests.conftest import SF_DIR


def test_running_totals_converge_to_batch(spark, tmp_path):
    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "stream_src")
    ev.repartition(4).write.parquet(src)  # 4 files, 1/trigger → 4 batches

    stream = read_event_stream(spark, src, ev.schema, max_files=1)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM stateful_sink").collect()
    # multiple micro-batches → per-user rows emitted more than once
    assert len(emitted) > ev.select("user_id").distinct().count()
    # running totals are monotone; the max per user is the final state
    final = {}
    for r in emitted:
        cur = final.get(r.user_id)
        if cur is None or r.n_total > cur[0]:
            final[r.user_id] = (r.n_total, r.v_total)
    expect = {
        r.user_id: (r.n, round(r.v, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert final == expect
