import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from clickhub_spark.session import get_spark

spark = get_spark("smoke-dedup-scale"); spark.sparkContext.setLogLevel("ERROR")
out = {}
# exact dedup at 60M rows: single hash-shuffle on the content key
big = spark.read.parquet("/tmp/spark_graft_lineitem_100x")
t0 = time.time()
dups = (big.groupBy("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
          .agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
          .agg(F.count(F.lit(1)).alias("groups"), F.sum("n").alias("rows")).first())
out["exact_dedup_60m_sec"] = round(time.time() - t0, 3)
out["dup_groups"] = dups.groups; out["dup_rows"] = dups.rows

# minhash signatures for 200k synthetic docs (16 perms, 3-gram shingles)
from clickhub_spark.operators.dedup import minhash_signatures
docs = spark.range(200_000).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ", *[
        F.expr(f"substring(md5(concat(cast(id % 5000 as string), '-', {j})), 1, 6)")
        for j in range(30)
    ]).alias("text"),
).repartition(32).cache()
docs.count()
t0 = time.time()
sigs = minhash_signatures(docs, "text", "doc_id", k=3, num_perm=16)
n = sigs.count()
out["minhash_200k_sec"] = round(time.time() - t0, 3)
out["minhash_rows"] = n
print(json.dumps(out))
