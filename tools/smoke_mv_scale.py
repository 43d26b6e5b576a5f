"""Scale smoke for insert-triggered MATERIALIZED VIEWs (ddl.py) —
the rollup-maintenance pattern at millions of rows per block.

What matters at 100 TB:

- The MV SELECT runs over the INSERTED BLOCK only (ClickHouse's
  contract): per-batch cost is one aggregate over the batch — the
  rollup's maintenance cost scales with the INGEST rate, never the
  table size.  A full-table recompute per batch would be the
  quadratic anti-pattern this design replaces.
- The SummingMergeTree target accumulates one partial row per
  (block, key); read_final merges with ONE hash aggregate (map-side
  combine), linear in partial rows.
- Exactness: block-wise SUM of integer payloads is associative, so
  the merged rollup must EQUAL a direct aggregate over the base
  table — checked with a full anti-join-style comparison collapsed
  to one scalar (count of disagreeing keys), nothing corpus-sized on
  the driver.

Construction: B blocks × R rows each over K keys; block b's payload
for key k is deterministic (b * k % 97), so the expected totals are
analytic as well.

Usage: python tools/smoke_mv_scale.py [rows_per_block] [n_blocks] [n_keys]
Prints one JSON line (artifact: MV_SCALE_r12.json).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from clickhub_spark.ddl import Warehouse

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    keys = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    root = tempfile.mkdtemp(prefix="chwh_mv_scale_")
    out: dict = {"rows_per_block": rows, "n_blocks": blocks, "n_keys": keys}
    try:
        wh = Warehouse(root)
        wh.execute("CREATE DATABASE IF NOT EXISTS ana")
        wh.execute(
            "CREATE TABLE ana.ev (`k` Int64, `v` Int64) "
            "ENGINE = MergeTree ORDER BY (k)"
        )
        wh.execute(
            "CREATE TABLE ana.totals (`k` Int64, `n` Int64, `sv` Int64) "
            "ENGINE = SummingMergeTree ORDER BY (k)"
        )
        wh.execute(
            "CREATE MATERIALIZED VIEW ana.mv TO ana.totals AS "
            "SELECT k, count() AS n, sum(v) AS sv FROM ana.ev GROUP BY k",
            spark=spark,
        )
        block_secs = []
        for b in range(blocks):
            df = (
                spark.range(rows)
                .select(
                    (F.col("id") % keys).alias("k"),
                    ((F.lit(b) * (F.col("id") % keys)) % 97).alias("v"),
                )
            )
            t0 = time.time()
            wh.insert(spark, "ana.ev", df)
            block_secs.append(round(time.time() - t0, 3))
        out["block_secs"] = block_secs
        # maintenance cost must not grow with table size: the last
        # block (table is 5x larger) stays within 2.5x of the first
        out["flat_cost_ok"] = bool(
            block_secs[-1] <= 2.5 * max(block_secs[0], 0.5)
        )

        # target holds exactly blocks x keys partial rows
        t0 = time.time()
        partials = wh.read(spark, "ana.totals").count()
        out["partial_rows"] = partials
        out["partials_ok"] = partials == blocks * keys

        # merged rollup == direct aggregate over the base table
        merged = wh.read_final(spark, "ana.totals")
        direct = (
            wh.read(spark, "ana.ev")
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        )
        diff = (
            merged.join(direct, "k", "full_outer")
            .where(
                ~(merged["n"].eqNullSafe(direct["n"]))
                | ~(merged["sv"].eqNullSafe(direct["sv"]))
            )
            .count()
        )
        out["merge_check_sec"] = round(time.time() - t0, 3)
        out["mismatched_keys"] = diff
        out["all_ok"] = bool(
            out["flat_cost_ok"] and out["partials_ok"] and diff == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    if not out.get("all_ok"):
        sys.exit(1)


if __name__ == "__main__":
    main()
