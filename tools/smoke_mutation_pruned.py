"""Scale smoke for PARTITION-PRUNED mutations (VERDICT r13 item 5):
``delete_where_partitioned`` / ``update_where_partitioned`` on a
hive-partitioned table must cost O(touched partitions), NOT O(table).

Setup mirrors the 100 TB shape: a date-partitioned fact table whose
PARTITION SIZE is constant (100k rows/day) while the table grows 10x
by adding days.  Mutating one day then touches the same amount of
data at both scales — the gate is delete/update time ~flat (≤2x,
generous for ambient noise) as the table grows 10x, where the
whole-table rewrite route scales ~10x (MUTATION_SCALE_r13.json
measured 2.7x/10x for delete because small fixed costs dominate at
1M; the pruned route removes even that).

Usage: python tools/smoke_mutation_pruned.py [rows_per_day] [days_big]
Prints one JSON line (artifact: MUTATION_PRUNED_r14.json).
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

    from clickhub_spark.operators.mutate import (
        delete_where_partitioned,
        update_where_partitioned,
    )
    from clickhub_spark.session import get_spark

    per_day = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    days_big = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    days_small = max(days_big // 10, 1)
    spark = get_spark()
    out: dict = {
        "metric": "mutation_pruned_scale",
        "rows_per_day": per_day,
    }

    results = {}
    for tag, days in (("small", days_small), ("big", days_big)):
        rows = per_day * days
        root = tempfile.mkdtemp(prefix=f"chmut_pruned_{tag}_")
        path = f"{root}/facts"
        t0 = time.time()
        (
            spark.range(rows)
            .select(
                (F.col("id") % days).alias("day"),
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("v"),
            )
            .repartition("day")
            .write.partitionBy("day")
            .parquet(path)
        )
        build = time.time() - t0

        # mutate exactly ONE day at both scales: cost must track the
        # touched partition (constant), not the table (10x)
        t0 = time.time()
        survivors = delete_where_partitioned(
            spark, path, "day", [3], F.col("k") % 2 == F.lit(1)
        )
        dele = time.time() - t0
        t0 = time.time()
        touched = update_where_partitioned(
            spark,
            path,
            "day",
            [5],
            F.col("v") < 50,
            {"v": F.col("v") + 1_000_000},
        )
        upd = time.time() - t0

        df = spark.read.parquet(path)
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v") >= 1_000_000, 1).otherwise(0)).alias(
                "hot"
            ),
            F.sum(
                F.when((F.col("day") == 3) & (F.col("k") % 2 == 1), 1)
                .otherwise(0)
            ).alias("odd3"),
        ).first()
        day3 = [k for k in range(rows) if k % days == 3]
        exp_deleted = sum(1 for k in day3 if k % 2 == 1)
        day5 = [k for k in range(rows) if k % days == 5]
        exp_hot = sum(1 for k in day5 if k % 97 < 50)
        ok = (
            agg["n"] == rows - exp_deleted
            and agg["hot"] == exp_hot
            and agg["odd3"] == 0
            and survivors == len(day3) - exp_deleted
            and touched == len(day5)
        )
        results[tag] = {
            "rows": rows,
            "days": days,
            "build_sec": round(build, 2),
            "delete_one_day_sec": round(dele, 2),
            "update_one_day_sec": round(upd, 2),
            "checks_ok": bool(ok),
        }
        shutil.rmtree(root, ignore_errors=True)

    out["small"] = results["small"]
    out["big"] = results["big"]
    out["delete_scaling_10x"] = round(
        results["big"]["delete_one_day_sec"]
        / max(results["small"]["delete_one_day_sec"], 1e-9),
        2,
    )
    out["update_scaling_10x"] = round(
        results["big"]["update_one_day_sec"]
        / max(results["small"]["update_one_day_sec"], 1e-9),
        2,
    )
    out["gates_ok"] = (
        results["small"]["checks_ok"]
        and results["big"]["checks_ok"]
        and out["delete_scaling_10x"] <= 2.0
        and out["update_scaling_10x"] <= 2.0
    )
    with open("/root/repo/MUTATION_PRUNED_r14.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0 if out["gates_ok"] else 1)


if __name__ == "__main__":
    main()
