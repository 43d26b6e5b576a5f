"""Parquet codec trade-off smoke (the 100 TB storage decision):
write the 100x lineitem table (60M rows) with snappy / zstd / gzip,
report bytes + write time + full-scan read time per codec."""
import json, os, shutil, subprocess, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from clickhub_spark.session import get_spark

spark = get_spark("smoke-codecs"); spark.sparkContext.setLogLevel("ERROR")
src = spark.read.parquet("/tmp/spark_graft_lineitem_100x")
out = {}
for codec in ("snappy", "zstd", "gzip"):
    d = f"/tmp/spark_graft_codec_{codec}"
    shutil.rmtree(d, ignore_errors=True)
    t0 = time.time()
    src.write.option("compression", codec).parquet(d)
    w = time.time() - t0
    size = int(subprocess.run(["du", "-sb", d], capture_output=True, text=True).stdout.split()[0])
    t0 = time.time()
    spark.read.parquet(d).agg(F.sum("l_extendedprice")).collect()
    r = time.time() - t0
    out[codec] = {"bytes": size, "write_sec": round(w, 2), "scan_sec": round(r, 2)}
    shutil.rmtree(d, ignore_errors=True)
print(json.dumps(out))
