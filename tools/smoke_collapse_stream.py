"""Scale smoke for the STREAMING collapse maintenance path
(streaming/collapse.py — VERDICT r8 item 6: the batch operator has the
10M smoke; this drives the foreachBatch accumulator loop itself at
≥1M changelog rows across ≥3 cycles, with a forced same-checkpoint
replay and a mid-stream compaction, all closed-form verified).

Construction: K keys; wave c (1..C) appends for every key a +1 state
(seq=c, payload=key*1000+c) and, for c>1, a -1 cancel of the
superseded state; the LAST wave also cancels the final state of keys
≡0 (mod 5).  After every cycle the FINAL read view is therefore
exactly "every (surviving) key at seq=c", giving a closed-form
(count, payload-checksum) verified with one distributed aggregate —
nothing corpus-sized reaches the driver.

Crash drills along the way:
- after an intermediate cycle, the checkpoint's last commit record is
  deleted and the loop re-run — a true same-checkpoint REPLAY; the
  overwrite-on-replay partial must keep the view identical;
- after the last cycle, the same drill runs against a batch that a
  compaction has already FOLDED — the _folded_through marker must
  drop the replay (without it the net would double).

Usage: python tools/smoke_collapse_stream.py [n_changelog_rows]
Prints one JSON line; exits 1 on any verification failure.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

C = 4  # waves (>=3 cycles + the post-compaction replay cycle)


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    from clickhub_spark.session import get_spark
    from clickhub_spark.streaming.collapse import (
        compact_accumulator,
        maintain_collapsed,
        read_collapsed,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    # rows = K states in wave 1 + 2K (state+cancel) per later wave
    k = max(1000, n // (2 * C - 1))
    spark = get_spark("smoke-collapse-stream")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="collapse_stream_")
    table = os.path.join(root, "changelog")
    acc = os.path.join(root, "acc")
    ck = os.path.join(root, "ck")
    schema = (
        StructType()
        .add("key", "long")
        .add("seq", "long")
        .add("payload", "long")
        .add("sign", "integer")
    )
    args = dict(keys=["key"], sign="sign", order=["seq"])
    out: dict = {
        "metric": "collapse_stream_smoke",
        "n_keys": k,
        "n_changelog": k + (C - 1) * 2 * k + (k + 4) // 5,
        "cycles": [],
    }
    sum_all = k * (k - 1) // 2
    n_mult5 = (k + 4) // 5
    sum_mult5 = 5 * ((n_mult5 - 1) * n_mult5 // 2)
    ok = True

    def write_wave(c: int) -> None:
        base = spark.range(k).select(
            F.col("id").alias("key"),
            F.lit(c).cast("long").alias("seq"),
            (F.col("id") * 1000 + c).alias("payload"),
            F.lit(1).alias("sign"),
        )
        waves = [base]
        if c > 1:  # cancel the superseded state
            waves.append(
                spark.range(k).select(
                    F.col("id").alias("key"),
                    F.lit(c).cast("long").alias("seq"),
                    (F.col("id") * 1000 + c - 1).alias("payload"),
                    F.lit(-1).alias("sign"),
                )
            )
        if c == C:  # final wave: fully cancel keys ≡0 (mod 5)
            waves.append(
                spark.range(k)
                .where(F.col("id") % 5 == 0)
                .select(
                    F.col("id").alias("key"),
                    F.lit(c).cast("long").alias("seq"),
                    (F.col("id") * 1000 + c).alias("payload"),
                    F.lit(-1).alias("sign"),
                )
            )
        df = waves[0]
        for w in waves[1:]:
            df = df.unionByName(w)
        df.repartition(8).write.mode("append").parquet(table)

    def verify(c: int, label: str) -> None:
        nonlocal ok
        if c == C:
            exp_n = k - n_mult5
            exp_ck = 1000 * (sum_all - sum_mult5) + c * exp_n
        else:
            exp_n, exp_ck = k, 1000 * sum_all + c * k
        got = (
            read_collapsed(spark, acc, ["key"], ["seq"])
            .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("ck"))
            .collect()[0]
        )
        good = (got.n, got.ck) == (exp_n, exp_ck)
        ok = ok and good
        if not good:
            out[f"mismatch_{label}"] = {
                "got": [got.n, got.ck], "exp": [exp_n, exp_ck]
            }

    def drop_last_commit() -> int:
        commits = sorted(
            int(os.path.basename(p))
            for p in glob.glob(os.path.join(ck, "commits", "*"))
            if os.path.basename(p).isdigit()
        )
        last = commits[-1]
        os.remove(os.path.join(ck, "commits", str(last)))
        crc = os.path.join(ck, "commits", f".{last}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        return last

    for c in range(1, C + 1):
        write_wave(c)
        t0 = time.time()
        maintain_collapsed(spark, table, acc, ck, schema, max_files=64, **args)
        cyc = {"cycle": c, "maintain_s": round(time.time() - t0, 2)}
        verify(c, f"cycle{c}")

        if c == 2:
            # forced same-checkpoint replay of an UNFOLDED batch: the
            # overwrite-on-replay partial keeps the view identical
            drop_last_commit()
            t0 = time.time()
            maintain_collapsed(
                spark, table, acc, ck, schema, max_files=64, **args
            )
            cyc["replay_s"] = round(time.time() - t0, 2)
            verify(c, "replay_unfolded")
        if c == 3:
            # mid-stream compaction: fold all partials, view unchanged
            t0 = time.time()
            n_acc = compact_accumulator(
                spark, acc, ["key"], ["seq"], checkpoint=ck
            )
            cyc["compact_s"] = round(time.time() - t0, 2)
            cyc["acc_rows_after_compact"] = n_acc
            verify(c, "post_compact")
        out["cycles"].append(cyc)

    # replay of a FOLDED batch: delete the last commit, compact (the
    # fold now contains that batch), re-run — the marker must drop it
    drop_last_commit()
    compact_accumulator(spark, acc, ["key"], ["seq"], checkpoint=ck)
    t0 = time.time()
    maintain_collapsed(spark, table, acc, ck, schema, max_files=64, **args)
    out["replay_folded_s"] = round(time.time() - t0, 2)
    verify(C, "replay_folded")

    out["ok"] = bool(ok)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
