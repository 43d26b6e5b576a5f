"""100x TPC-H fact smoke: replicate sf0.1 lineitem 100x (60M rows)
TO PARQUET (the honest path — scans hit disk, not a cached RDD), then
time Q1/Q6-shaped aggregates and the Q3-shaped join at 1x vs 100x.
Sub-linear-to-linear scaling with held plan shapes is the pass
criterion; prints one JSON line for PERFORMANCE.md."""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from clickhub_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/spark_graft_lineitem_100x"
BIG_ORD = "/tmp/spark_graft_orders_100x"


def q1(li):
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q6(li):
    return li.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


def q3ish(li, orders):
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def t(df):
    t0 = time.time()
    df.collect()
    return round(time.time() - t0, 3)


def main():
    spark = get_spark("smoke-100x")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    li1 = spark.read.parquet(f"{BASE}/lineitem.parquet")
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    n1 = li1.count()

    if not os.path.exists(BIG + "/_SUCCESS"):
        shutil.rmtree(BIG, ignore_errors=True)
        t0 = time.time()
        # disjoint orderkeys per replica so join fan-out grows with data
        reps = li1.crossJoin(
            spark.range(100).withColumnRenamed("id", "__rep")
        ).select(
            (F.col("l_orderkey") + F.col("__rep") * 10_000_000).alias("l_orderkey"),
            *[c for c in li1.columns if c != "l_orderkey"],
        )
        reps.repartition(64).write.mode("overwrite").parquet(BIG)
        out["build_100x_sec"] = round(time.time() - t0, 3)
    big = spark.read.parquet(BIG)
    out["rows_1x"], out["rows_100x"] = n1, big.count()

    # orders replicated the same way, ALSO materialized to parquet:
    # the replication crossJoin is harness scaffolding — left lazy it
    # leaks a BroadcastNestedLoopJoin into the measured q3 plan and
    # the fingerprint gate (correctly) flags it
    if not os.path.exists(BIG_ORD + "/_SUCCESS"):
        shutil.rmtree(BIG_ORD, ignore_errors=True)
        orders.crossJoin(
            spark.range(100).withColumnRenamed("id", "__rep")
        ).select(
            (F.col("o_orderkey") + F.col("__rep") * 10_000_000).alias(
                "o_orderkey"
            ),
            *[c for c in orders.columns if c != "o_orderkey"],
        ).repartition(32).write.mode("overwrite").parquet(BIG_ORD)
    orders_big = spark.read.parquet(BIG_ORD)

    out["q1_1x_sec"] = t(q1(li1))
    out["q1_100x_sec"] = t(q1(big))
    out["q6_1x_sec"] = t(q6(li1))
    out["q6_100x_sec"] = t(q6(big))
    out["q3_1x_sec"] = t(q3ish(li1, orders))
    out["q3_100x_sec"] = t(q3ish(big, orders_big))
    for q in ("q1", "q6", "q3"):
        out[f"{q}_scaling"] = round(out[f"{q}_100x_sec"] / max(0.001, out[f"{q}_1x_sec"]), 1)

    # plan fingerprints at BOTH scales (VERDICT r10 #8: the "plans
    # you'd want at 100x" claim carries a measured artifact).  A
    # broadcast→sort-merge flip on the grown join side is the CORRECT
    # scale adaptation (recorded, not failed); red flags are the
    # scale-killers: a cartesian/nested-loop join, a row-at-a-time
    # Python UDF, or super-linear (>150x) time at 100x data.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from plan_guard import fingerprint

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    # VERDICT r13 item 6: Q3 at 100x is the one shuffle-bound row (3
    # Exchanges + SMJ, 12.4x time).  The bucketed layout — both fact
    # tables pre-shuffled ON the join key at write time
    # (writer.write_bucketed, already zero-Exchange-oracled at sf0.01
    # by q_join_bucketed) — must drop the join Exchanges at the 60M
    # build too: gate Exchange <= 1 (only the tiny groupBy agg
    # exchange survives) and scaling materially below the unbucketed
    # 12.4x.
    from clickhub_spark.sources.writer import write_bucketed

    t0 = time.time()
    write_bucketed(
        big, "li_100x_bucketed", "l_orderkey", n_buckets=64,
        sort_col="l_orderkey",
    )
    write_bucketed(
        orders_big, "ord_100x_bucketed", "o_orderkey", n_buckets=64,
        sort_col="o_orderkey",
    )
    out["bucket_build_sec"] = round(time.time() - t0, 3)
    li_b = spark.table("li_100x_bucketed")
    ord_b = spark.table("ord_100x_bucketed")
    out["q3_bucketed_100x_sec"] = t(q3ish(li_b, ord_b))
    out["q3_bucketed_scaling"] = round(
        out["q3_bucketed_100x_sec"] / max(0.001, out["q3_1x_sec"]), 1
    )

    fps = {}
    for name, df in (
        ("q1_1x", q1(li1)),
        ("q1_100x", q1(big)),
        ("q6_1x", q6(li1)),
        ("q6_100x", q6(big)),
        ("q3_1x", q3ish(li1, orders)),
        ("q3_100x", q3ish(big, orders_big)),
        ("q3_bucketed_100x", q3ish(li_b, ord_b)),
    ):
        fp = fingerprint(df._jdf.queryExecution().explainString(mode))
        fps[name] = {k: v for k, v in fp.items() if v}
    out["plan_fingerprints"] = fps
    ok = (
        all(
            fps[n].get("CartesianProduct", 0) == 0
            and fps[n].get("BroadcastNestedLoopJoin", 0) == 0
            and fps[n].get("BatchEvalPython", 0) == 0
            for n in fps
        )
        and all(out[f"{q}_scaling"] <= 150 for q in ("q1", "q6", "q3"))
        and fps["q3_bucketed_100x"].get("Exchange", 0) <= 1
        and out["q3_bucketed_scaling"] < out["q3_scaling"]
    )
    out["gates_ok"] = bool(ok)
    with open("/root/repo/TPCH_100X_r14.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
