"""Scale smoke for statement-path MUTATIONS (round 13): ``ALTER
TABLE … UPDATE/DELETE … WHERE`` at millions of rows.

What matters at 100 TB:

- a mutation is ONE part rewrite through writer.compact's crash-safe
  swap — scan → filter/withColumn → range-clustered write; no
  driver-side data, no shuffle beyond the re-cluster exchange (the
  same cost the engine's own mutation merge pays);
- the predicate prunes NOTHING on the rewrite (every part must be
  rewritten, like ClickHouse), so cost is linear in TABLE size and
  independent of match selectivity — the smoke verifies both
  mutations stay in one-rewrite territory as rows grow 10x;
- correctness is verified with scalar aggregates only (counts +
  payload checksums), nothing corpus-sized on the driver.

Usage: python tools/smoke_mutation_scale.py [n_rows]
Prints one JSON line (artifact: MUTATION_SCALE_r13.json).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

DDL = (
    "CREATE TABLE default.facts (`k` Int64, `grp` Int64, `v` Int64, "
    "`status` String) ENGINE = MergeTree ORDER BY (k)"
)


def main() -> None:
    import pyspark.sql.functions as F  # noqa: F401

    from clickhub_spark.ddl import Warehouse
    from clickhub_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark()
    out: dict = {"metric": "mutation_scale", "rows": n}

    results = {}
    for tag, rows in (("small", n // 10), ("big", n)):
        root = tempfile.mkdtemp(prefix=f"chwh_mut_{tag}_")
        wh = Warehouse(root)
        wh.execute(DDL)
        t0 = time.time()
        wh.execute(
            f"INSERT INTO default.facts SELECT number AS k, "
            f"number % 1000 AS grp, number % 97 AS v, 'cold' AS status "
            f"FROM numbers({rows})",
            spark=spark,
        )
        build = time.time() - t0

        # UPDATE: ~1/1000 of rows match, but the rewrite is table-sized
        t0 = time.time()
        wh.execute(
            "ALTER TABLE default.facts UPDATE v = v + 1000000, "
            "status = 'hot' WHERE grp = 7",
            spark=spark,
        )
        upd = time.time() - t0
        t0 = time.time()
        wh.execute(
            "ALTER TABLE default.facts DELETE WHERE modulo(grp, 100) = 3",
            spark=spark,
        )
        dele = time.time() - t0

        df = wh.read(spark, "default.facts")
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("status") == "hot", 1).otherwise(0)).alias(
                "hot"
            ),
            F.sum(
                F.when(F.col("grp") == 7, F.col("v")).otherwise(0)
            ).alias("v7"),
        ).first()
        # expected: 10 of 1000 grps deleted; grp 7 updated
        exp_n = rows - sum(
            (rows - g + 999) // 1000 for g in range(3, 1000, 100)
        )
        exp_hot = (rows - 7 + 999) // 1000
        exp_v7 = sum(
            g % 97 + 1_000_000 for g in range(7, rows, 1000)
        )
        ok = (
            agg["n"] == exp_n
            and agg["hot"] == exp_hot
            and agg["v7"] == exp_v7
        )
        results[tag] = {
            "rows": rows,
            "build_sec": round(build, 2),
            "update_sec": round(upd, 2),
            "delete_sec": round(dele, 2),
            "checks_ok": bool(ok),
        }
        shutil.rmtree(root, ignore_errors=True)

    out["small"] = results["small"]
    out["big"] = results["big"]
    out["update_scaling_10x"] = round(
        results["big"]["update_sec"] / max(results["small"]["update_sec"], 1e-9),
        1,
    )
    out["delete_scaling_10x"] = round(
        results["big"]["delete_sec"] / max(results["small"]["delete_sec"], 1e-9),
        1,
    )
    out["gates_ok"] = (
        results["small"]["checks_ok"]
        and results["big"]["checks_ok"]
        and out["update_scaling_10x"] <= 15
        and out["delete_scaling_10x"] <= 15
    )
    with open("/root/repo/MUTATION_SCALE_r13.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0 if out["gates_ok"] else 1)


if __name__ == "__main__":
    main()
