"""Streaming stateful-operator scale smoke (round 12): drive the
applyInPandasWithState operators — streaming sequenceMatch (NEW r12)
and streaming windowFunnel (r11) — through Structured Streaming at
200k users / ~1M events split into two availableNow micro-batch
waves, and verify (a) wall time is single-digit-minutes-per-wave
territory on local[32], (b) the final streamed answers EQUAL the
batch operators over the same rows (the state store carried 200k
bounded per-user states across batches correctly).

State posture being certified: both operators keep FIXED-WIDTH
per-user state (<= 6 timestamps for the seqmatch NFA, K (start,
achieved) pairs for the funnel DP) — the state store is bounded by
user cardinality, never event volume.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import _parse_datatype_string  # noqa: E402

from clickhub_spark.operators.funnel import window_funnel  # noqa: E402
from clickhub_spark.operators.seqmatch import sequence_match  # noqa: E402
from clickhub_spark.session import get_spark  # noqa: E402
from clickhub_spark.streaming.funnel import funnel_stream  # noqa: E402
from clickhub_spark.streaming.mv import read_event_stream  # noqa: E402
from clickhub_spark.streaming.seqmatch import (  # noqa: E402
    sequence_match_stream,
)

SRC = "/tmp/spark_graft_stream_state_src"
N_USERS, EV_PER_USER = 200_000, 5
SCHEMA = "user_id long, event_id long, ts double, event_type string"


def build(spark) -> None:
    if os.path.exists(SRC + "/slice=1/_SUCCESS"):
        return
    shutil.rmtree(SRC, ignore_errors=True)
    # deterministic pseudo-random letters via xxhash64; ts strictly
    # increasing per user; slice 0 = first 3 events, slice 1 = rest
    base = (
        get_spark_range(spark)
        .select(
            (F.col("id") % N_USERS).alias("user_id"),
            F.col("id").alias("event_id"),
            ((F.col("id") / N_USERS).cast("long") * 7.0
             + (F.col("id") % 3)).alias("ts"),
            F.element_at(
                F.split(F.lit("v,c,p,v,c,x,y,z"), ","),
                (F.abs(F.xxhash64("id")) % 8 + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    for s, cond in (
        (0, F.col("event_id") < N_USERS * 3),
        (1, F.col("event_id") >= N_USERS * 3),
    ):
        sl = f"{SRC}/slice={s}"
        base.where(cond).repartition(16).write.mode("overwrite").parquet(sl)
        for f in os.listdir(sl):
            os.utime(os.path.join(sl, f), (1_000_000 + s, 1_000_000 + s))


def get_spark_range(spark):
    return spark.range(N_USERS * EV_PER_USER)


def run_stream(spark, tag, make_out):
    # 16 files per slice; maxFilesPerTrigger=16 + mtime ordering =>
    # each slice arrives as its own micro-batch (two waves)
    stream = read_event_stream(
        spark, SRC + "/slice=*", _parse_datatype_string(SCHEMA),
        max_files=16,
    )
    out = make_out(stream)
    name = f"state_scale_{tag}"
    ck = f"/tmp/spark_graft_stream_state_ck_{tag}"
    shutil.rmtree(ck, ignore_errors=True)
    t0 = time.time()
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sec = round(time.time() - t0, 3)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # memory-sink row order is not contractually batch-ordered; both
    # outputs are MONOTONE per user (matched never un-matches, levels
    # never drop in default mode), so max() is the final value
    final: dict = {}
    for r in rows:
        cur = final.get(r[0])
        final[r[0]] = r[1] if cur is None else max(cur, r[1])
    return sec, final, len(rows)


def main() -> int:
    spark = get_spark("smoke-stream-state")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "stream_state_scale", "users": N_USERS,
                 "events": N_USERS * EV_PER_USER}
    t0 = time.time()
    build(spark)
    out["build_sec"] = round(time.time() - t0, 3)

    lt = F.col("event_type")
    conds = [lt.isin("v", "z"), lt.isin("c", "z"), lt.isin("p", "z")]
    pattern = "(?1)(?t<30)(?2).*(?3)"

    def mk_seq(stream):
        for k, c in enumerate(conds):
            stream = stream.withColumn(f"__c{k}", c)
        return sequence_match_stream(
            stream, "user_id", "ts", [f"__c{k}" for k in range(3)],
            pattern, order_cols=["event_id"],
        )

    def mk_funnel(stream):
        for k, c in enumerate(conds):
            stream = stream.withColumn(f"__f{k}", c)
        return funnel_stream(
            stream, "user_id", "ts", [f"__f{k}" for k in range(3)],
            order_cols=["event_id"], window_s=30.0,
        )

    out["seqmatch_sec"], seq_final, out["seqmatch_emitted"] = run_stream(
        spark, "seq", mk_seq
    )
    out["funnel_sec"], fun_final, out["funnel_emitted"] = run_stream(
        spark, "funnel", mk_funnel
    )

    df = spark.read.parquet(SRC + "/slice=*")
    batch_seq = {
        r.user_id: r.matched
        for r in sequence_match(
            df, "user_id", ["ts", "event_id"], conds, pattern, ts_col="ts"
        ).collect()
    }
    batch_fun = {
        r.user_id: r.level
        for r in window_funnel(
            df, user_col="user_id", order=["ts", "event_id"], steps=conds,
            ts_col="ts", window_s=30.0, multi_match=True,
        ).collect()
    }
    seq_diff = sum(
        1 for u, m in seq_final.items() if m != batch_seq.get(u, False)
    )
    fun_diff = sum(
        1 for u, lv in fun_final.items() if lv != batch_fun.get(u, 0)
    )
    out["seqmatch_stream_users"] = len(seq_final)
    out["funnel_stream_users"] = len(fun_final)
    out["seqmatch_mismatches"] = seq_diff
    out["funnel_mismatches"] = fun_diff
    out["seq_matched_frac"] = round(
        sum(seq_final.values()) / max(1, len(seq_final)), 4
    )
    gates = {
        "seq_equals_batch": seq_diff == 0,
        "funnel_equals_batch": fun_diff == 0,
        "all_users_stated": len(seq_final) == N_USERS
        and len(fun_final) == N_USERS,
        "state_persisted_across_waves": out["seqmatch_emitted"] > N_USERS
        and out["funnel_emitted"] > N_USERS,
        "wall_time_sane": out["seqmatch_sec"] < 600
        and out["funnel_sec"] < 600,
    }
    out["gates"] = gates
    out["gates_ok"] = all(gates.values())
    print(json.dumps(out))
    return 0 if out["gates_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
