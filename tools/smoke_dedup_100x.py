"""100x scale artifact for the MinHash-LSH near-dedup path (VERDICT
r11 #7): materialize 100k and 10M synthetic documents TO PARQUET (the
honest path — scans hit disk), run the FULL banding pipeline
(operators/dedup.minhash_candidate_pairs: shingle hashes → wide
signature aggregate → band hashes → bucket join → pairs) at both
scales, and gate on

- plan shape at 10M: no CartesianProduct / BroadcastNestedLoopJoin /
  BatchEvalPython anywhere (the all-pairs scale-killers), and the
  bucket join present as a shuffled equi-join;
- time scaling <= 150x for 100x data;
- recall floor: every PLANTED identical-duplicate pair must be found
  (identical text → identical signature → collides in every band),
  and the candidate set must stay within 3x the planted count (the
  banding is selective, not an implicit cross join).

Docs: 15 md5-derived words each; within every 100-id block the ids
with remainder 0 and 1 share a template (one planted pair per block,
1% duplicate rate — realistic for a crawl corpus); all other docs are
unique, so buckets stay near-singleton and the measured cost is the
banding itself.  Writes DEDUP_100X_r12.json; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clickhub_spark.operators.dedup import minhash_candidate_pairs  # noqa: E402
from clickhub_spark.session import get_spark  # noqa: E402

SMALL = "/tmp/spark_graft_docs_100k"
BIG = "/tmp/spark_graft_docs_10m"
N_SMALL, N_BIG = 100_000, 10_000_000
WORDS, K, NUM_PERM, BANDS = 15, 3, 16, 8


def build(spark, path: str, n: int) -> None:
    if os.path.exists(path + "/_SUCCESS"):
        return
    shutil.rmtree(path, ignore_errors=True)
    # template id: ids = 0,1 (mod 100) share; everything else unique
    tpl = F.expr("IF(id % 100 < 2, id - (id % 100), id)")
    words = [
        F.expr(
            f"substring(md5(concat(cast(__tpl as string), '-', {j})), 1, 6)"
        )
        for j in range(WORDS)
    ]
    (
        spark.range(n)
        .withColumn("__tpl", tpl)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *words).alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )


def run_pairs(spark, path: str):
    docs = spark.read.parquet(path)
    pairs = minhash_candidate_pairs(
        docs, "text", "doc_id", k=K, num_perm=NUM_PERM, bands=BANDS
    )
    t0 = time.time()
    n_pairs = pairs.count()
    return round(time.time() - t0, 3), n_pairs, pairs


def main() -> int:
    spark = get_spark("smoke-dedup-100x")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "dedup_100x", "docs_small": N_SMALL,
                 "docs_big": N_BIG, "num_perm": NUM_PERM, "bands": BANDS}

    t0 = time.time()
    build(spark, SMALL, N_SMALL)
    build(spark, BIG, N_BIG)
    out["build_sec"] = round(time.time() - t0, 3)

    out["pairs_small_sec"], out["pairs_small"], _ = run_pairs(spark, SMALL)
    out["pairs_big_sec"], out["pairs_big"], pairs_big = run_pairs(spark, BIG)
    out["scaling"] = round(
        out["pairs_big_sec"] / max(0.001, out["pairs_small_sec"]), 1
    )

    # recall floor: identical-text pairs collide in EVERY band, so all
    # planted pairs must be candidates; selectivity: candidates stay
    # within 3x planted (no implicit cross join hiding in the bucket
    # join).  Planted pair (b, b+1) for every 100-block b.
    planted_small, planted_big = N_SMALL // 100, N_BIG // 100
    found_planted = (
        pairs_big.where(
            (F.col("id_a") % 100 == 0) & (F.col("id_b") == F.col("id_a") + 1)
        ).count()
    )
    out["planted_big"] = planted_big
    out["found_planted_big"] = found_planted

    # plan fingerprint at 10M (the shape that must hold at 100 TB)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from plan_guard import fingerprint

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    fp = fingerprint(
        pairs_big._jdf.queryExecution().explainString(mode)
    )
    out["plan_fingerprint_big"] = {k: v for k, v in fp.items() if v}
    gates = {
        "no_cartesian": fp.get("CartesianProduct", 0) == 0,
        "no_nested_loop": fp.get("BroadcastNestedLoopJoin", 0) == 0,
        "no_python_row_udf": fp.get("BatchEvalPython", 0) == 0,
        # r13 shape: one shuffled groupBy(band, hash) bucket aggregate
        # replaces the bucket self-join — and the corpus is scanned
        # exactly ONCE (the join form computed every signature twice)
        "bucket_group_is_shuffled_agg": fp.get("Exchange", 0) >= 1
        and fp.get("HashAggregate", 0) + fp.get("ObjectHashAggregate", 0)
        + fp.get("SortAggregate", 0) >= 1,
        "single_corpus_scan": fp.get("Scan parquet", 0) == 1,
        "scaling_le_150x": out["scaling"] <= 150,
        "planted_recall_100pct": found_planted == planted_big,
        "selective_banding": out["pairs_big"] <= 3 * planted_big,
    }
    out["gates"] = gates
    out["gates_ok"] = all(gates.values())
    with open("/root/repo/DEDUP_100X_r13.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["gates_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
