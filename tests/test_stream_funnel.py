"""Streaming windowFunnel (streaming/funnel.py): the incremental
per-user DP folded over time-ordered micro-batches must converge to
the batch operator's answer for every mode — including multi-match
via several-true step columns — and its state must persist across
batches (a chain STARTED in batch 1 completes in batch 3)."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from clickhub_spark.operators.funnel import window_funnel
from clickhub_spark.streaming.funnel import funnel_stream
from clickhub_spark.streaming.mv import read_event_stream

_CONDS = ["v", "c", "p"]


def _make_streams(n_users, seed):
    rng = random.Random(seed)
    streams = {}
    for uid in range(n_users):
        length = rng.randint(1, 12)
        ts = 0.0
        evts = []
        for _ in range(length):
            ts += rng.choice([0.0, 1.0, 1.0, 5.0])
            evts.append((ts, rng.choice("vvccppxy")))
        streams[uid] = evts
    return streams


def _write_time_slices(spark, streams, src, n_slices=3):
    """Write events into n_slices files split by GLOBAL time so the
    file stream delivers per-user time-ordered batches (the operator's
    documented ordering contract); forced mtime order."""
    rows = [
        (uid, uid * 1000 + i, float(ts), letter)
        for uid, evts in streams.items()
        for i, (ts, letter) in enumerate(evts)
    ]
    hi = max(r[2] for r in rows) + 1.0
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts double, event_type string"
    for s in range(n_slices):
        lo_b, hi_b = hi * s / n_slices, hi * (s + 1) / n_slices
        part = [r for r in rows if lo_b <= r[2] < hi_b]
        if not part:
            part = rows[:0]
        sl = str(src + f"/slice={s}")
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sl)
        for f in os.listdir(sl):
            os.utime(os.path.join(sl, f), (1_000_000 + s, 1_000_000 + s))
    return schema


def _run_stream(spark, tmp_path, src, schema_str, steps_cols, window_s, modes, tag):
    from pyspark.sql.types import _parse_datatype_string

    stream = read_event_stream(
        spark, src + "/slice=*", _parse_datatype_string(schema_str), max_files=1
    )
    for k, c in enumerate(steps_cols):
        stream = stream.withColumn(f"__f{k}", c)
    out = funnel_stream(
        stream,
        user_col="user_id",
        ts_col="ts",
        step_cols=[f"__f{k}" for k in range(len(steps_cols))],
        order_cols=["event_id"],
        window_s=window_s,
        modes=modes,
    )
    name = f"funnel_sink_{tag}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql(
        f"SELECT * FROM {name}"
    ).collect()
    # update mode re-emits per batch; the LAST emission is the live
    # level — levels are non-decreasing except the stop freeze, so
    # take the final row per user via emission order
    final = {}
    for r in emitted:
        final[r.user_id] = r.level
    return final, len(emitted)


def test_stream_funnel_converges_to_batch(spark, tmp_path):
    streams = _make_streams(80, seed=424)
    src = str(tmp_path / "src")
    schema_str = _write_time_slices(spark, streams, src)
    rows = [
        (uid, uid * 1000 + i, float(ts), letter)
        for uid, evts in streams.items()
        for i, (ts, letter) in enumerate(evts)
    ]
    df = spark.createDataFrame(rows, schema_str)
    lt = F.col("event_type")
    steps = [lt == c for c in _CONDS]

    for tag, modes in (
        ("default", ()),
        ("order", ("strict_order",)),
        ("dedup", ("strict_dedup",)),
        ("inc", ("strict_increase",)),
    ):
        got, n_emitted = _run_stream(
            spark, tmp_path, src, schema_str, steps, 6.0, modes, tag
        )
        want = {
            r.user_id: r.level
            for r in window_funnel(
                df,
                user_col="user_id",
                order=["ts", "event_id"],
                steps=steps,
                ts_col="ts",
                window_s=6.0,
                modes=modes,
            ).collect()
        }
        assert got == want, f"modes={modes}: stream != batch"
        # state persisted across batches: users emitted more than once
        assert n_emitted > len(want)


def test_stream_funnel_multimatch_columns(spark, tmp_path):
    """Multi-match in the streaming form: several step columns true on
    one event ≡ the batch operator's multi_match explode."""
    streams = _make_streams(60, seed=777)
    # overlay letters that hit multiple steps
    rng = random.Random(5)
    streams = {
        uid: [
            (ts, rng.choice("vvccppbbzxy"))
            for ts, _ in evts
        ]
        for uid, evts in streams.items()
    }
    src = str(tmp_path / "src_mm")
    schema_str = _write_time_slices(spark, streams, src)
    rows = [
        (uid, uid * 1000 + i, float(ts), letter)
        for uid, evts in streams.items()
        for i, (ts, letter) in enumerate(evts)
    ]
    df = spark.createDataFrame(rows, schema_str)
    lt = F.col("event_type")
    steps = [
        lt.isin("v", "b", "z"),
        lt.isin("c", "b", "z"),
        lt.isin("p", "z"),
    ]
    got, _ = _run_stream(
        spark, tmp_path, src, schema_str, steps, None, (), "mm"
    )
    want = {
        r.user_id: r.level
        for r in window_funnel(
            df,
            user_col="user_id",
            order=["ts", "event_id"],
            steps=steps,
            ts_col="ts",
            multi_match=True,
        ).collect()
    }
    assert got == want
