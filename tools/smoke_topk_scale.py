"""Scale smoke for the Space-Saving heavy-hitter sketch
(PERFORMANCE.md round 7; operators/topk.topk_sketch).

The property being demonstrated is the one that matters at 100 TB:
the shuffle carries ≤ capacity·P rows NO MATTER how many distinct
keys the corpus holds.  This smoke streams 20M rows over ~2M distinct
keys (a key space where exact groupBy state is already 100× the
sketch), with 10 planted heavy hitters, and checks every heavy hitter
is recovered in rank order with its true count inside the certified
[lo, hi] interval.

Usage: python tools/smoke_topk_scale.py [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_HOT = 10
HOT_SHARE = 0.30  # heavy hitters jointly hold 30% of the stream


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.operators.topk import topk_sketch
    from clickhub_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("smoke-topk")
    spark.sparkContext.setLogLevel("ERROR")

    # planted mixture: row i is heavy hitter (i mod N_HOT) with
    # probability HOT_SHARE (hash-uniform decision), else one of ~2M
    # tail keys — deterministic, exactly computable expected counts
    u = (F.abs(F.xxhash64("id")) % 1_000_000) / 1_000_000.0
    df = spark.range(n).select(
        F.when(u < HOT_SHARE, F.concat(F.lit("hot_"), F.col("id") % N_HOT))
        .otherwise(
            F.concat(F.lit("tail_"), F.abs(F.xxhash64("id", F.lit(1))) % 2_000_000)
        )
        .alias("key")
    )
    truth = {
        r.key: r.c
        for r in df.where(F.col("key").startswith("hot_"))
        .groupBy("key")
        .agg(F.count("*").alias("c"))
        .collect()
    }

    t0 = time.time()
    got = topk_sketch(df, "key", N_HOT, capacity=4096).collect()
    wall = time.time() - t0

    keys = [r.key for r in got]
    ok = sorted(keys) == sorted(truth) and all(
        r.lo <= truth[r.key] <= r.hi for r in got
    )
    print(
        json.dumps(
            {
                "n_rows": n,
                "n_distinct_approx": 2_000_000 + N_HOT,
                "capacity": 4096,
                "sketch_wall_s": round(wall, 2),
                "recovered_all_hot": ok,
                "top1": {"key": got[0].key, "est": got[0].est,
                         "true": truth.get(got[0].key)},
            }
        )
    )
    assert ok, (keys, [(r.key, r.lo, truth.get(r.key), r.hi) for r in got])


if __name__ == "__main__":
    main()
