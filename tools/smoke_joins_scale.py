"""Scale smoke for the join family (PERFORMANCE.md round 8;
operators/asof.py + operators/rangejoin.py — VERDICT r7 item 6).

The properties being demonstrated are the ones that matter at 100 TB:

- as-of join (union+window): ONE shuffle on the key, the window never
  materializes candidate pairs — cost is linear in |left|+|right|,
  not |left|·|right-per-key| like a range join + row_number would be.
- binned range join: each point meets each interval in exactly ONE
  bin, so the join output IS the answer (no candidate-pair blowup, no
  post-join dedup shuffle).

Both run at 10M+ rows with ANALYTIC oracles — the data is constructed
so every expected match count / matched value is exactly computable,
and the checks run distributed (one scalar aggregate; nothing
corpus-sized ever reaches the driver).

Usage: python tools/smoke_joins_scale.py [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

K = 100_000  # as-of join key cardinality
QUOTE_EVERY = 100  # right side ticks: one quote per key per 100s
IV_W = 10  # interval stride
IV_LEN = 25  # interval length (overlapping: each point in 2-3)


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.operators.asof import asof_join
    from clickhub_spark.operators.rangejoin import point_in_interval_join
    from clickhub_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("smoke-joins")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "joins_scale_smoke", "n_rows": n}

    # ---- as-of join: 10M left rows, 1M right rows, 100k keys --------
    # left row i: key = i % K, ts = i // K (so ts is dense per key);
    # right: per key, quotes at ts = 0, 100, 200, ... with
    # value = key * 1_000_000 + ts — the expected as-of match for a
    # left row is analytically (ts // 100) * 100, making the check a
    # pure map-side comparison after the join.
    left = spark.range(n).select(
        (F.col("id") % K).alias("key"), (F.col("id") / K).cast("long").alias("ts")
    )
    max_ts = (n - 1) // K
    right = (
        spark.range(K)
        .select(F.col("id").alias("key"))
        .select(
            "key",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(max_ts)), F.lit(QUOTE_EVERY))
            ).alias("qts"),
        )
        .select("key", "qts", (F.col("key") * 1_000_000 + F.col("qts")).alias("qval"))
    )
    t0 = time.time()
    j = asof_join(left, right, ["key"], "ts", "qts", ["qval"])
    expected = F.col("key") * 1_000_000 + (F.col("ts") - F.col("ts") % QUOTE_EVERY)
    bad = j.agg(
        F.sum(
            F.when(
                F.col("asof_qval").isNull() | (F.col("asof_qval") != expected), 1
            ).otherwise(0)
        ).alias("bad"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()[0]
    out["asof_sec"] = round(time.time() - t0, 2)
    out["asof_rows"] = bad.rows
    out["asof_mismatches"] = int(bad.bad or 0)
    assert bad.rows == n, f"as-of dropped rows: {bad.rows} != {n}"
    assert out["asof_mismatches"] == 0, f"as-of wrong values: {bad.bad}"

    # ---- binned range join: 10M integer points x 1M intervals -------
    # point p = 0..n-1; interval j covers [IV_W*j, IV_W*j + IV_LEN) —
    # overlapping windows, each point falls in ceil(IV_LEN/IV_W)-ish
    # intervals.  Expected total matches has the closed form
    #   sum_j max(0, min(n, IV_W*j + IV_LEN) - IV_W*j)
    # computed exactly below without materializing anything.
    m = n // IV_W  # interval count scales with the points
    points = spark.range(n).select(F.col("id").alias("p"))
    ivs = spark.range(m).select(
        F.col("id").alias("iv_id"),
        (F.col("id") * IV_W).alias("s"),
        (F.col("id") * IV_W + IV_LEN).alias("e"),
    )
    t0 = time.time()
    got = point_in_interval_join(points, ivs, "p", "s", "e", bin_width=IV_W).count()
    out["range_sec"] = round(time.time() - t0, 2)
    out["range_matches"] = got
    # closed form: intervals fully below n contribute IV_LEN each;
    # the last few are clipped at n
    full = max(0, min(m, (n - IV_LEN) // IV_W + 1))
    expected_total = full * IV_LEN + sum(
        max(0, n - IV_W * j) for j in range(full, m)
    )
    out["range_expected"] = expected_total
    assert got == expected_total, f"range join: {got} != {expected_total}"

    out["ok"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
