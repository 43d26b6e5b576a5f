"""Round-15 scale artifact: partition lifecycle ops are O(1) metadata.

DETACH PARTITION / ATTACH PARTITION / DROP PARTITION move or remove
one directory — no data read — so their cost must stay FLAT while the
partition grows 10x.  This is the posture that makes them usable at
100 TB (take a partition offline for quarantine/backup/re-ingest in
milliseconds), in contrast to MODIFY COLUMN, which is a deliberate
full rewrite (ClickHouse's own mutation semantics) and is measured
here once to document the contrast, not gated.

Writes PARTITION_LIFECYCLE_r15.json:
- detach/attach/drop wall seconds at 1x and 10x partition rows
  (flat gate: 10x time <= 5x 1x time — generous, both are sub-ms
  renames dominated by fs noise)
- read-visibility checks: detached rows invisible, attach restores
  the exact count
- modify_column_rewrite_sec at 1x for the documented contrast
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhub_spark.ddl import Warehouse  # noqa: E402
from clickhub_spark.session import get_spark  # noqa: E402

ROOT = "/tmp/spark_graft_partlife"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PARTITION_LIFECYCLE_r15.json",
)


def build(wh: Warehouse, spark, name: str, rows: int) -> None:
    wh.execute(
        f"CREATE TABLE git.{name} (`k` Int64, `time` DateTime, `v` Int64) "
        "ENGINE = MergeTree PARTITION BY toYYYYMM(time) ORDER BY (k)"
    )
    # 3 partitions; the target partition (202402) carries `rows` rows
    df = spark.range(rows).selectExpr(
        "id AS k",
        "CASE WHEN id % 10 = 0 THEN timestamp'2024-01-15 00:00:00' "
        "     WHEN id % 10 = 1 THEN timestamp'2024-03-15 00:00:00' "
        "     ELSE timestamp'2024-02-15 00:00:00' END AS time",
        "id * 7 AS v",
    )
    wh.insert(spark, f"git.{name}", df)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 4)


def main() -> int:
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark("partition-lifecycle-smoke")
    wh = Warehouse(ROOT)
    wh.execute("CREATE DATABASE git")
    out: dict = {"purpose": __doc__.strip().splitlines()[0], "scales": {}}

    base_rows = 1_000_000
    for label, rows in (("1x", base_rows), ("10x", base_rows * 10)):
        name = f"pl_{label}"
        build(wh, spark, name, rows)
        n_target = wh.read(spark, f"git.{name}").where(
            "time >= '2024-02-01' AND time < '2024-03-01'"
        ).count()
        total = wh.read(spark, f"git.{name}").count()
        t_detach = timed(
            lambda: wh.execute(f"ALTER TABLE git.{name} DETACH PARTITION '202402'")
        )
        visible_after_detach = wh.read(spark, f"git.{name}").count()
        t_attach = timed(
            lambda: wh.execute(f"ALTER TABLE git.{name} ATTACH PARTITION '202402'")
        )
        visible_after_attach = wh.read(spark, f"git.{name}").count()
        t_drop = timed(
            lambda: wh.execute(f"ALTER TABLE git.{name} DROP PARTITION '202402'")
        )
        visible_after_drop = wh.read(spark, f"git.{name}").count()
        out["scales"][label] = {
            "rows_total": total,
            "rows_in_partition": n_target,
            "detach_sec": t_detach,
            "attach_sec": t_attach,
            "drop_sec": t_drop,
            "detach_hides_rows": visible_after_detach == total - n_target,
            "attach_restores_rows": visible_after_attach == total,
            "drop_removes_rows": visible_after_drop == total - n_target,
        }

    # contrast: MODIFY COLUMN is a deliberate full rewrite (mutation)
    t0 = time.perf_counter()
    wh.execute("ALTER TABLE git.pl_1x MODIFY COLUMN v Float64", spark=spark)
    out["modify_column_rewrite_sec_1x"] = round(time.perf_counter() - t0, 2)

    s1, s10 = out["scales"]["1x"], out["scales"]["10x"]
    out["flat_gate"] = {
        "detach_10x_over_1x": round(s10["detach_sec"] / max(s1["detach_sec"], 1e-4), 2),
        "pass": (
            s10["detach_sec"] <= max(5 * s1["detach_sec"], 0.05)
            and s10["attach_sec"] <= max(5 * s1["attach_sec"], 0.05)
            and s10["drop_sec"] <= max(5 * s1["drop_sec"], 0.05)
            and all(
                s[k]
                for s in (s1, s10)
                for k in (
                    "detach_hides_rows",
                    "attach_restores_rows",
                    "drop_removes_rows",
                )
            )
        ),
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0 if out["flat_gate"]["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
