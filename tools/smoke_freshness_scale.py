"""Scale smoke for the insert→MV freshness loop (PERFORMANCE.md
round 8; streaming/freshness.py — VERDICT r7 item 8).

The reference's end-to-end loop (README.md:247-268) at volume: three
waves of events land as parquet (~1M rows total), each followed by one
``refresh()`` cycle (ingest stream + stars-MV stage, availableNow).
After every cycle the smoke verifies EXACTLY-ONCE end to end:

- the events table holds exactly the rows landed so far (no dropped
  and no replayed ingest batches),
- the stars view equals a direct batch groupBy over everything landed
  so far (no double-counted MV partials — the per-batch overwrite
  sink's whole job),
- a final cycle with NOTHING new is a no-op (idempotent poll).

Checks run distributed (exceptAll + count); per-cycle latency is
recorded.  Usage: python tools/smoke_freshness_scale.py [n_rows_total]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_USERS = 50_000
TYPES = ["view", "push", "fork", "star"]
WAVES = 3


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.session import get_spark
    from clickhub_spark.streaming.freshness import read_stars, refresh

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("smoke-freshness")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="freshness_smoke_")
    landing, wh = f"{root}/landing", f"{root}/wh"
    out: dict = {"metric": "freshness_scale_smoke", "n_rows": n, "cycles": []}

    def wave(w: int):
        """Deterministic wave w: ids [w*n/WAVES, (w+1)*n/WAVES)."""
        lo, hi = w * n // WAVES, (w + 1) * n // WAVES
        return (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias(
                    "ts"
                ),
                (F.col("id") % N_USERS).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in TYPES]),
                    (F.col("id") % len(TYPES) + 1).cast("int"),
                ).alias("event_type"),
                (F.col("id") % 1000 / 10.0).alias("value"),
                F.lit("{}").alias("props"),
            )
        )

    try:
        landed = None
        for w in range(WAVES):
            df = wave(w)
            df.repartition(8).write.mode("append").parquet(f"{landing}/wave={w}")
            landed = df if landed is None else landed.unionByName(df)
            t0 = time.time()
            view = refresh(spark, landing, wh)
            cyc = round(time.time() - t0, 2)
            # exactly-once ingest: events table == everything landed
            tbl = spark.read.parquet(f"{wh}/events").select(
                "event_id", "user_id", "event_type"
            )
            ref = landed.select("event_id", "user_id", "event_type")
            ingest_diff = tbl.exceptAll(ref).count() + ref.exceptAll(tbl).count()
            # exactly-once MV: stars view == direct batch aggregate
            exact = (
                landed.where(F.col("event_type") == "view")
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("stars"))
            )
            mv_diff = view.exceptAll(exact).count() + exact.exceptAll(view).count()
            out["cycles"].append(
                {"cycle": w, "sec": cyc, "ingest_diff": ingest_diff, "mv_diff": mv_diff}
            )
            assert ingest_diff == 0, f"cycle {w}: ingest not exactly-once"
            assert mv_diff == 0, f"cycle {w}: MV partials wrong"
        # idempotent no-op cycle
        before = read_stars(spark, f"{wh}/stars")
        t0 = time.time()
        after = refresh(spark, landing, wh)
        out["noop_sec"] = round(time.time() - t0, 2)
        noop_diff = after.exceptAll(before).count() + before.exceptAll(after).count()
        out["noop_diff"] = noop_diff
        assert noop_diff == 0, "no-op cycle changed the view"
        out["ok"] = True
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
