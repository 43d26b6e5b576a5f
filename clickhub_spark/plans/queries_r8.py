"""Round-8 query wave.

Driver-checkable evidence for the EVICTION regime of the Misra-Gries
heavy-hitter sketch (VERDICT r7 item 4): q_agg_topk_sketch and
q_agg_topk_weighted run where capacity exceeds key cardinality, so
their driver rows only certify the exact regime; the sketch's whole
point — certified [lo, hi] bounds while counters are being evicted —
was pinned by units alone.  q_agg_topk_bounds closes that gap with an
oracle-checked query whose OUTPUT is the certification itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query

#: sketch capacity for the forced-eviction certification query —
#: deliberately below the key cardinality at EVERY test SF (4 / 8 / 11
#: distinct log-buckets at sf0.001/0.01/0.1) so each partition's
#: summary evicts and the [lo, hi] interval is genuinely approximate
_BOUNDS_CAP = 3


@query(
    "q_agg_topk_bounds",
    oracle=f"""
    WITH k AS (
        SELECT length(bin(user_id)) AS kb
        FROM events WHERE user_id IS NOT NULL
    ), c AS (
        SELECT kb, count(*) AS cnt FROM k GROUP BY kb
    ), t AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM c
    )
    SELECT n_events, n_keys,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c
             WHERE cnt * {_BOUNDS_CAP + 1} > (SELECT n_events FROM t))
               AS n_heavy,
           CAST(0 AS BIGINT) AS viol_bounds,
           CAST(0 AS BIGINT) AS missing_heavy
    FROM t
    """,
)
def q_agg_topk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified-bound check for the Misra-Gries sketch UNDER EVICTION
    (the regime ClickHouse ``topK`` actually runs in at scale — the
    exact-regime twins are q_agg_topk_sketch / q_agg_topk_weighted).

    Events are bucketed by ``length(bin(user_id))`` — a deterministic
    log-scale key whose top bucket carries ~1/3 of all mass — and
    sketched at capacity 3, below the key cardinality at every test
    SF, so every partition's summary evicts counters and the reported
    [lo, hi] intervals are genuinely approximate (lo < hi).  The query
    then joins the sketch output back to the exact per-key counts and
    emits the certification as data:

    - ``viol_bounds``  — reported keys whose exact count falls outside
      [lo, hi], or that don't exist at all.  0 by the MG invariant
      (operators/topk.py: per-partition c ≤ true_p ≤ c + D_p, absent
      keys ≤ D_p — sums over partitions).
    - ``missing_heavy`` — keys with exact count > N/(capacity+1) that
      the sketch failed to report.  0 by the frequent-elements
      guarantee: a key absent from every partition summary has
      true ≤ Σ_p D_p ≤ Σ_p N_p/(cap+1) = N/(cap+1).
    - ``n_events`` / ``n_keys`` / ``n_heavy`` — exact scalars both
      engines compute independently (heavy via integer cross-multiply,
      cnt·(cap+1) > N — no float division to diverge on).

    Both zero-columns are THEOREMS, not data accidents: they hold for
    any partition layout, so the row is deterministic even though the
    sketch's per-key estimates under eviction are not.  The exact
    groupBy exists only to certify the sketch — at 100 TB you'd run
    the sketch alone; here the key space is tiny (≤11) so the check
    costs one extra shuffle of ≤11 rows."""
    from clickhub_spark.operators.topk import topk_sketch

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(F.length(F.bin("user_id")).alias("kb"))
    )
    # lazy persist: kb feeds both the sketch pass and the exact
    # groupBy; one corpus read when the combined plan executes
    ev = ev.persist()
    # k = 1 << 20 ≫ capacity·P: keep ALL surviving keys (no top-k cut
    # — the bound check must see the sketch's full report)
    sk = topk_sketch(ev, "kb", 1 << 20, capacity=_BOUNDS_CAP).select(
        F.col("key").alias("kb"), "lo", "hi"
    )
    exact = ev.groupBy(F.col("kb").cast("string").alias("kb")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = exact.agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    heavy = exact.crossJoin(F.broadcast(tot)).where(
        F.col("cnt") * (_BOUNDS_CAP + 1) > F.col("n_events")
    )
    n_heavy = heavy.agg(F.count(F.lit(1)).alias("n_heavy"))
    viol = (
        sk.join(F.broadcast(exact), "kb", "left")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("cnt").isNull()
                        | (F.col("lo") > F.col("cnt"))
                        | (F.col("hi") < F.col("cnt")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("viol_bounds")
        )
    )
    missing = (
        heavy.select("kb")
        .join(F.broadcast(sk.select("kb")), "kb", "left_anti")
        .agg(F.count(F.lit(1)).alias("missing_heavy"))
    )
    return (
        tot.crossJoin(F.broadcast(n_heavy))
        .crossJoin(F.broadcast(viol))
        .crossJoin(F.broadcast(missing))
        .select("n_events", "n_keys", "n_heavy", "viol_bounds", "missing_heavy")
    )

