"""Scale smoke for the round-5 third wave: bloom build/screen at 2M
keys, the engine_numbers DataSource at 100M rows, and gitlog over this
repo's real history.  Prints one JSON line; numbers land in
PERFORMANCE.md."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clickhub_spark.operators import bloom  # noqa: E402
from clickhub_spark.session import get_spark  # noqa: E402
from clickhub_spark.sources.pyds import register_sources  # noqa: E402


def main():
    spark = get_spark("smoke-pyds-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    register_sources(spark)
    out = {}

    # --- bloom: 2M member keys, 32M bits (4 MiB), optimal k ---
    # 16.8 bits/key -> theoretical fp ~4e-4; the smoke checks the
    # measured rate stays in that regime.
    m_bits = 1 << 25
    k = bloom.optimal_k(m_bits, 2_000_000)
    members = spark.range(2_000_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    t0 = time.time()
    bm = bloom.build_bloom(members, "h", m_bits, k)
    out["bloom_build_2m_sec"] = round(time.time() - t0, 3)
    probes = spark.range(2_000_000).select(
        F.xxhash64(F.concat(F.col("id").cast("string"), F.lit("|x"))).alias("h")
    )
    t0 = time.time()
    fp = bloom.might_contain(probes, "h", bm, k).count()
    out["bloom_screen_2m_sec"] = round(time.time() - t0, 3)
    out["bloom_fp_rate_nonmembers"] = round(fp / 2_000_000, 6)
    t0 = time.time()
    kept = bloom.might_contain(members, "h", bm, k).count()
    out["bloom_members_kept"] = kept  # must be 2_000_000 (no false negatives)

    # --- engine_numbers: 100M rows, 32 planned partitions ---
    t0 = time.time()
    n = (
        spark.read.format("engine_numbers")
        .option("n", 100_000_000)
        .option("numPartitions", 32)
        .load()
    )
    s = n.agg(F.sum("num").alias("s")).first().s
    out["numbers_100m_agg_sec"] = round(time.time() - t0, 3)
    assert s == 100_000_000 * (100_000_000 - 1) // 2

    # --- gitlog: this repo's real history ---
    t0 = time.time()
    g = (
        spark.read.format("gitlog")
        .option("path", "/root/repo")
        .option("numPartitions", 8)
        .load()
    )
    out["gitlog_repo_commits"] = g.count()
    out["gitlog_repo_sec"] = round(time.time() - t0, 3)
    by_author = g.groupBy("author").count().count()
    out["gitlog_distinct_authors"] = by_author

    print(json.dumps(out))


if __name__ == "__main__":
    main()
