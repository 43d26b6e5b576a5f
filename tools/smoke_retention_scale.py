"""Scale smoke for the retention rollup (PERFORMANCE.md round 8;
operators/retention.py — GraphiteMergeTree-style downsampling).

The property that matters at 100 TB: the rollup is ONE hash aggregate
whose exchange carries keys × buckets, never raw rows — the tier CASE
and bucket arithmetic are map-side scalars and partials combine before
the shuffle.

Construction is fully analytic: n rows spread uniformly over a 30-day
window (one row per second per key lane), values = 0.01 · (id % 100),
three tiers (1h / 6h / 1d) split at pinned cutoffs.  Expected bucket
counts and the GLOBAL n/total (which the rollup must conserve exactly:
counts are integers and totals are re-summed from identical doubles)
are closed-form; verification is one scalar aggregate over the rollup
output — nothing corpus-sized reaches the driver.

Usage: python tools/smoke_retention_scale.py [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

#: 30-day window starting 2024-01-01 00:00:00 UTC
T0 = 1704067200
DAYS = 30
#: tier cutoffs (days from T0) and bucket widths
CUT_1H = 24  # >= day 24 -> 1h buckets
CUT_6H = 10  # >= day 10 -> 6h buckets; older -> 1d
K = 64  # key lanes


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.operators.retention import rollup_retention
    from clickhub_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    span = DAYS * 86400
    spark = get_spark("smoke-retention")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "retention_scale_smoke", "n_rows": n, "n_keys": K}

    # row i: ts = T0 + (i % span) — wraps the 30-day window so n ≥ span
    # covers every second; key = i % K, value = 0.01 · (i % 100)
    rows = spark.range(n).select(
        (F.col("id") % K).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(T0) + (F.col("id") % span)).alias("ts"),
        ((F.col("id") % 100) * 0.01).alias("v"),
    )
    tiers = [
        (f"2024-01-{1 + CUT_1H:02d} 00:00:00", 3600),
        (f"2024-01-{1 + CUT_6H:02d} 00:00:00", 21600),
    ]

    t0 = time.time()
    rolled = rollup_retention(rows, "ts", ["k"], "v", tiers, 86400)
    got = rolled.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").alias("n_total"),
        F.round(F.sum("total"), 2).alias("v_total"),
        F.countDistinct("bucket_s").alias("n_tiers"),
    ).collect()[0]
    out["rollup_s"] = round(time.time() - t0, 2)

    # closed-form expectations: with n ≥ span every second of the
    # window is hit, every hour holds ≥ K distinct seconds, so every
    # (key, bucket) cell is populated
    exp_rows = n
    exp_buckets = K * ((DAYS - CUT_1H) * 24 + (CUT_1H - CUT_6H) * 4 + CUT_6H)
    covered = n >= span
    # value sum: ids 0..n-1, v = 0.01*(id%100); groups of 100 sum to 49.50
    g, r = divmod(n, 100)
    exp_v = round(49.50 * g + 0.01 * (r * (r - 1) // 2), 2)
    ok = (
        got.n_total == exp_rows
        and abs(got.v_total - exp_v) < 0.05
        and (not covered or (got.n_tiers == 3 and got.n_buckets == exp_buckets))
    )
    out.update(
        {
            "n_buckets": got.n_buckets,
            "exp_buckets": exp_buckets if covered else None,
            "rows_conserved": got.n_total == exp_rows,
            "v_total": float(got.v_total),
            "exp_v_total": exp_v,
            "tiers_seen": got.n_tiers,
            "ok": bool(ok),
        }
    )
    print(json.dumps(out))
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
