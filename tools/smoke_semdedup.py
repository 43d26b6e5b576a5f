"""Scale smoke for the semantic-dedup / centroid-assignment tier
(PERFORMANCE.md section "SemDeDup scale smoke").

Replicates sf0.1 embeddings ×REPL (default 50 → 100k vectors, each
with REPL-1 exact duplicates — worst-case duplicate density) and
times:

1. map-only k=8 assignment via the literal-inline tier;
2. map-only k=256 assignment via the Arrow-matmul tier (the large-k
   path real SemDeDup builds need — 256 cells keeps the per-cell
   pairwise candidate set bounded as the corpus grows, the paper's
   contract);
3. full semantic_dedup at k=256 over the replicated corpus
   (assignment + cluster-partitioned pairwise + per-victim argmin).

Usage: python tools/smoke_semdedup.py [sf_dir] [repl]
Prints one JSON line with the timings; numbers are recorded in
PERFORMANCE.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    from clickhub_spark.catalog import load
    from clickhub_spark.functions.vectors import (
        as_double,
        nearest_centroid,
        nearest_centroid_vectorized,
    )
    from clickhub_spark.operators.dedup import semantic_dedup
    from clickhub_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("smoke-semdedup", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_base = emb.count()
    big = emb
    for i in range(1, repl):
        big = big.unionAll(
            emb.select((F.col("vec_id") + i * n_base).alias("vec_id"), "embedding")
        )
    big = big.select("vec_id", as_double(F.col("embedding")).alias("v"))
    big = big.localCheckpoint()  # materialize the replica so timings exclude the union

    cent8 = [
        (r["vec_id"], r["v"])
        for r in sorted(
            big.where(F.col("vec_id") < 8).collect(), key=lambda r: r["vec_id"]
        )
    ]
    cent256 = [
        (r["vec_id"], r["v"])
        for r in sorted(
            big.where(F.col("vec_id") < 256).collect(), key=lambda r: r["vec_id"]
        )
    ]

    out = {"n_vectors": n_base * repl, "repl": repl}

    t = time.monotonic()
    big.select(nearest_centroid(F.col("v"), cent8)["cluster"].alias("c")).groupBy(
        "c"
    ).count().collect()
    out["assign_inline_k8_sec"] = round(time.monotonic() - t, 2)

    t = time.monotonic()
    big.select(
        nearest_centroid_vectorized(F.col("v"), cent256)["cluster"].alias("c")
    ).groupBy("c").count().collect()
    out["assign_matmul_k256_sec"] = round(time.monotonic() - t, 2)

    t = time.monotonic()
    dropped = semantic_dedup(
        big.select("vec_id", F.col("v").alias("embedding")),
        n_centroids=256,
        threshold=0.95,
        vec_col="embedding",
    ).count()
    out["semdedup_k256_sec"] = round(time.monotonic() - t, 2)
    out["n_dropped"] = dropped
    out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
