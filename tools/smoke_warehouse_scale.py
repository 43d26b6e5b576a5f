"""Scale smoke for the DDL warehouse path (ddl.py) — the round-12
statement front-end at millions of rows.

What matters at 100 TB:

- INSERT is ``write_sorted``: repartitionByRange on the ORDER BY key
  → disjoint file key ranges → min/max row-group pruning works on
  every part; cost is one range exchange per batch, no driver data.
- ``read_final`` (merge-on-read FINAL) is ONE hash aggregate with
  map-side partial combine (``max_by`` over the version struct) —
  linear in part rows at any key cardinality.
- ``OPTIMIZE TABLE … FINAL`` (merge-on-write) is the same aggregate
  feeding compact()'s crash-safe swap; afterwards the base table IS
  the final view and reads skip the merge entirely.

Construction is analytic: B batches × K keys; batch b re-imports the
same K keys with version payload b, so the base table holds B·K rows
and FINAL must keep exactly K, each at the max batch stamp — verified
with one scalar aggregate (count + payload checksum), nothing
corpus-sized on the driver.

Usage: python tools/smoke_warehouse_scale.py [n_keys] [n_batches]
Prints one JSON line (artifact: WAREHOUSE_SCALE_r12.json).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

# reference types.json:7 commits DDL, trimmed to the load-bearing
# shape (key prefix + version column) at width 6
DDL = (
    "CREATE TABLE git.commits ( `hash` String, `author` "
    "LowCardinality(String), `time` DateTime, `lines_added` UInt32, "
    "`repo_name` LowCardinality(String), `updated_at` DateTime "
    "MATERIALIZED now() ) ENGINE = ReplacingMergeTree "
    "ORDER BY (repo_name, time, hash)"
)


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from clickhub_spark.ddl import Warehouse

    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="chwh_scale_")
    out: dict = {"n_keys": n_keys, "n_batches": n_batches}
    try:
        wh = Warehouse(root)
        wh.execute("CREATE DATABASE IF NOT EXISTS git")
        wh.execute(DDL)

        def batch(b: int):
            return (
                spark.range(n_keys)
                .select(
                    F.concat(F.lit("h"), F.col("id")).alias("hash"),
                    F.concat(F.lit("dev"), (F.col("id") % 97)).alias("author"),
                    F.timestamp_seconds(
                        F.lit(1_700_000_000) + F.col("id") % 86_400
                    ).alias("time"),
                    # version payload: batch stamp rides in lines_added
                    F.lit(b).cast("long").alias("lines_added"),
                    F.concat(F.lit("org/repo"), (F.col("id") % 1000)).alias(
                        "repo_name"
                    ),
                )
            )

        t0 = time.time()
        for b in range(n_batches):
            wh.insert(spark, "git.commits", batch(b))
        out["insert_sec"] = round(time.time() - t0, 3)

        base_n = wh.read(spark, "git.commits").count()
        out["base_rows"] = base_n

        t0 = time.time()
        agg = wh.read_final(spark, "git.commits").agg(
            F.count("*").alias("n"), F.sum("lines_added").alias("ck")
        ).first()
        out["final_read_sec"] = round(time.time() - t0, 3)
        # every key must survive exactly once at the LAST batch stamp
        # (updated_at version increases per insert batch)
        ok_read = (agg.n, agg.ck) == (n_keys, (n_batches - 1) * n_keys)
        out["final_read_ok"] = bool(ok_read)

        t0 = time.time()
        msg = wh.execute("OPTIMIZE TABLE git.commits FINAL", spark=spark)
        out["optimize_sec"] = round(time.time() - t0, 3)
        out["optimize_msg"] = msg

        t0 = time.time()
        agg2 = wh.read(spark, "git.commits").agg(
            F.count("*").alias("n"), F.sum("lines_added").alias("ck")
        ).first()
        out["post_optimize_read_sec"] = round(time.time() - t0, 3)
        ok_opt = (agg2.n, agg2.ck) == (n_keys, (n_batches - 1) * n_keys)
        out["optimize_ok"] = bool(ok_opt)

        # idempotence: a second OPTIMIZE keeps the same row count
        msg2 = wh.execute("OPTIMIZE TABLE git.commits FINAL", spark=spark)
        out["optimize_idempotent"] = msg2 == f"optimized {n_keys}"

        out["all_ok"] = bool(
            ok_read and ok_opt and out["optimize_idempotent"]
            and base_n == n_keys * n_batches
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    if not out.get("all_ok"):
        sys.exit(1)


if __name__ == "__main__":
    main()
