"""20x growth smoke for the sweep/interpolate/bloom-screen families:
replicate sf0.1 events x20 with disjoint user/event ids and time
shifts so group counts grow with data (the cluster shape), then time
the representative queries at 1x vs 20x."""
import json, sys, time
sys.path.insert(0, "/root/repo")  # repo-root imports
from pyspark.sql import functions as F
from clickhub_spark.session import get_spark
from clickhub_spark.operators import bloom

spark = get_spark("smoke-growth"); spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
reps = [
    ev.select(
        (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
        (F.col("ts") + F.expr(f"INTERVAL {i*40} DAYS")).alias("ts"),
        (F.col("user_id") + F.lit(i * 100_000)).alias("user_id"),
        "event_type", "value", "props",
    )
    for i in range(20)
]
big = reps[0]
for r in reps[1:]:
    big = big.unionByName(r)
big = big.repartition(64).cache(); n_big = big.count()
ev = ev.cache(); n1 = ev.count()

def sweep(df):
    from pyspark.sql.window import Window
    d = df.where(F.col("value") > 0)
    s = F.unix_timestamp("ts").alias("t")
    e = (F.unix_timestamp("ts") + F.floor(F.col("value") * 10).cast("bigint")).alias("t")
    pts = d.select("event_type", s, F.lit(1).alias("delta")).unionAll(
        d.select("event_type", e, F.lit(-1).alias("delta")))
    w = Window.partitionBy("event_type").orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return pts.select("event_type", F.sum("delta").over(w).alias("live")).groupBy("event_type").agg(F.max("live"))

def t(f):
    t0 = time.time(); f(); return round(time.time() - t0, 3)

out = {"rows_1x": n1, "rows_20x": n_big}
out["sweep_1x_sec"] = t(lambda: sweep(ev).collect())
out["sweep_20x_sec"] = t(lambda: sweep(big).collect())
# bloom screen growth: membership bitmap from 1x, screen 20x
bm = bloom.build_bloom(ev.select(F.xxhash64("props").alias("h")), "h", 1 << 23, 5)
out["bloom_screen_20x_sec"] = t(lambda: bloom.might_contain(
    big.select(F.xxhash64("props").alias("h")), "h", bm, 5).count())
print(json.dumps(out))
