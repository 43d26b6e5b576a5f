"""Scale smoke for passage-frequency dedup (PERFORMANCE.md round 7).

The registered query runs on ≤5k documents; this smoke replicates the
sf0.1 documents table R times (doc_id offset per replica, default
R=100 → 500k docs / ~9M passages) and runs the SAME operator
(operators/textops.passage_dup_stats).  Replication makes every
passage appear in ≥R documents, so the frequency join and the flag
logic are exercised at full duplicate density — the worst case for
the hash-keyed shuffle.

Usage: python tools/smoke_passage_dedup.py [R]
Prints one JSON line with doc counts and wall time.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.catalog import load
    from clickhub_spark.operators.textops import passage_dup_stats
    from clickhub_spark.session import get_spark

    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("smoke-passage")
    spark.sparkContext.setLogLevel("ERROR")
    base = load(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_base = base.count()
    reps = spark.range(r).select(F.col("id").alias("rep"))
    corpus = base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    )
    t0 = time.time()
    out = passage_dup_stats(corpus, "text", "doc_id")
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_passages").alias("passages"),
        F.sum(F.when(F.col("flagged"), 1).otherwise(0)).alias("flagged"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "replicas": r,
                "base_docs": n_base,
                "docs": agg["docs"],
                "passages": int(agg["passages"]),
                "flagged": int(agg["flagged"]),
                "wall_sec": wall,
            }
        )
    )


if __name__ == "__main__":
    main()
