"""Scale smoke for the collapsing-engine family (PERFORMANCE.md
round 8; operators/collapsing.py).

The property that matters at 100 TB: a sign-changelog FINAL is ONE
hash-aggregate shuffle on the key — each group folds to a
constant-size accumulator (net + two candidate rows), so cost is
linear in changelog size at any key cardinality, with map-side
partial combine doing most of the work before the exchange.

Construction is fully analytic so verification is exact and runs
distributed (one scalar aggregate; nothing corpus-sized reaches the
driver):

- plain collapse: K keys × S states each (payload = key·1000 + seq),
  every superseded state cancelled, and keys ≡0 (mod 5) cancel their
  final state too → survivors are exactly the keys ≢0 (mod 5) at
  seq = S-1, with a closed-form count and payload checksum.
- versioned collapse: versions 1..S per key, every version ≡0 (mod 3)
  retracted out of the middle → every key survives at the largest
  non-multiple-of-3 version, again closed-form.

Usage: python tools/smoke_collapsing_scale.py [n_state_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

S = 10  # states per key (plain form)
SV = 9  # versions per key (versioned form)


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.operators.collapsing import (
        collapse_final,
        collapse_final_versioned,
    )
    from clickhub_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    # the closed-form expectations assume exactly S states per key —
    # round down to a positive multiple of S rather than mis-FAIL
    n = max(S, n - n % S)
    k = n // S
    spark = get_spark("smoke-collapsing")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "collapsing_scale_smoke", "n_states": n, "n_keys": k}

    # ---- plain collapse ---------------------------------------------
    states = spark.range(n).select(
        (F.col("id") % k).alias("key"),
        (F.col("id") / k).cast("long").alias("seq"),
        ((F.col("id") % k) * 1000 + (F.col("id") / k).cast("long")).alias("payload"),
        F.lit(1).alias("sign"),
    )
    cancels = states.where(
        (F.col("seq") < S - 1) | (F.col("key") % 5 == 0)
    ).withColumn("sign", F.lit(-1))
    log = states.unionByName(cancels)
    n_log = n + (n - k) + (k + 4) // 5  # states + superseded + final-cancels
    out["n_changelog"] = n_log

    t0 = time.time()
    got = collapse_final(
        log, keys=["key"], sign="sign", order=["seq"]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("payload").alias("ck"),
        F.sum(F.when(F.col("sign") != 1, 1).otherwise(0)).alias("n_cancel_rows"),
    ).collect()[0]
    out["collapse_s"] = round(time.time() - t0, 2)

    n_mult5 = (k + 4) // 5  # keys ≡0 (mod 5) in [0, k)
    exp_n = k - n_mult5
    sum_all = k * (k - 1) // 2
    sum_mult5 = 5 * ((n_mult5 - 1) * n_mult5 // 2)
    exp_ck = 1000 * (sum_all - sum_mult5) + (S - 1) * exp_n
    ok_plain = (got.n, got.ck, got.n_cancel_rows) == (exp_n, exp_ck, 0)
    out["plain_ok"] = bool(ok_plain)
    if not ok_plain:
        out["plain_got"] = [got.n, got.ck, got.n_cancel_rows]
        out["plain_exp"] = [exp_n, exp_ck, 0]

    # ---- versioned collapse -----------------------------------------
    nv = k * SV
    vstates = spark.range(nv).select(
        (F.col("id") % k).alias("key"),
        ((F.col("id") / k).cast("long") + 1).alias("ver"),
        ((F.col("id") % k) * 1000 + (F.col("id") / k).cast("long") + 1).alias(
            "payload"
        ),
        F.lit(1).alias("sign"),
    )
    vcancels = vstates.where(F.col("ver") % 3 == 0).withColumn("sign", F.lit(-1))
    vlog = vstates.unionByName(vcancels)

    t0 = time.time()
    vgot = collapse_final_versioned(
        vlog, keys=["key"], sign="sign", version="ver", order=["ver"]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("payload").alias("ck"),
        F.min("ver").alias("vmin"),
        F.max("ver").alias("vmax"),
    ).collect()[0]
    out["versioned_collapse_s"] = round(time.time() - t0, 2)

    # largest version in 1..SV that is not ≡0 (mod 3)
    vexp = SV if SV % 3 else SV - 1
    exp_vck = 1000 * sum_all + vexp * k
    ok_ver = (vgot.n, vgot.ck, vgot.vmin, vgot.vmax) == (k, exp_vck, vexp, vexp)
    out["versioned_ok"] = bool(ok_ver)
    if not ok_ver:
        out["versioned_got"] = [vgot.n, vgot.ck, vgot.vmin, vgot.vmax]
        out["versioned_exp"] = [k, exp_vck, vexp, vexp]

    print(json.dumps(out))
    spark.stop()
    if not (ok_plain and ok_ver):
        sys.exit(1)


if __name__ == "__main__":
    main()
