"""Scale smoke for the general sequenceMatch/sequenceCount operator
(operators/seqmatch.py, round 11).

Demonstrates the two execution paths' 100 TB posture on ~1.2M events:

- regex path (no time conditions): per-user bitset strings + ONE
  rlike/regexp_count — one user_id shuffle, everything JVM-side;
- automaton path (time conditions): applyInPandas per user — same
  shuffle, Python only over each user's own entries (the engine
  aggregate's own buffering), parallel across users.

Users are synthesized in four analytic archetypes with closed-form
expected outcomes (conds c1={v,z} c2={c,z} c3={p,z} — 'z' matches all
three, exercising the overlap/bitset path at scale):

- hit     v,c,p  : match(?1.*?2.*?3)=T  count(?1)(?2)=1  time<1h=T
- miss    v,p,c  : match=F              count=0          time=F
- double  v,c,v,c,p : match=T           count=2          time=T
- overlap z,z,z  : match=T              count=1          time=T

(time pattern (?1)(?t<3600)(?2) needs DIRECT adjacency; every
archetype's first two entries are 600 s apart, so hit/double/overlap
match and miss — whose second entry is 'p', failing cond2 — does not.)

Usage: python tools/smoke_seqmatch_scale.py [n_users]  (default 300k
users ≈ 1.2M events).  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import pyspark.sql.functions as F

    from clickhub_spark.operators.seqmatch import (
        sequence_count,
        sequence_match,
    )
    from clickhub_spark.session import get_spark

    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark("smoke-seqmatch")
    spark.sparkContext.setLogLevel("ERROR")

    users = spark.range(n_users).select(
        F.col("id").alias("user_id"), (F.col("id") % 4).alias("arch")
    )
    step = users.select(
        "user_id",
        "arch",
        F.explode(
            F.when(
                F.col("arch") == 2,
                F.array(*[F.lit(i) for i in range(5)]),
            ).otherwise(F.array(*[F.lit(i) for i in range(3)]))
        ).alias("pos"),
    )
    letter = (
        F.when(F.col("arch") == 3, F.lit("z"))
        .when((F.col("arch") == 1) & (F.col("pos") == 1), F.lit("p"))
        .when((F.col("arch") == 1) & (F.col("pos") == 2), F.lit("c"))
        .when((F.col("arch") == 2) & (F.col("pos").isin(0, 2)), F.lit("v"))
        .when((F.col("arch") == 2) & (F.col("pos").isin(1, 3)), F.lit("c"))
        .when((F.col("arch") == 2) & (F.col("pos") == 4), F.lit("p"))
        .when(F.col("pos") == 0, F.lit("v"))
        .when(F.col("pos") == 1, F.lit("c"))
        .otherwise(F.lit("p"))
    )
    ev = step.select(
        "user_id",
        (F.col("user_id") * 10 + F.col("pos")).alias("event_id"),
        (
            F.col("user_id").cast("double") % 86_400
            + F.col("pos") * 600
        ).alias("ts"),
        letter.alias("event_type"),
    ).repartition(32)
    n_events = ev.count()

    lt = F.col("event_type")
    conds = [lt.isin("v", "z"), lt.isin("c", "z"), lt.isin("p", "z")]
    n_arch = [(n_users - a + 3) // 4 for a in range(4)]
    out: dict = {
        "metric": "seqmatch_scale_smoke",
        "n_users": n_users,
        "n_events": n_events,
    }

    t0 = time.time()
    m = sequence_match(
        ev, "user_id", ["ts", "event_id"], conds, "(?1).*(?2).*(?3)"
    )
    got_true = m.where("matched").count()
    out["match_regex"] = {
        "sec": round(time.time() - t0, 2),
        "ok": got_true == n_arch[0] + n_arch[2] + n_arch[3],
    }

    t0 = time.time()
    cnt = sequence_count(
        ev, "user_id", ["ts", "event_id"], conds, "(?1)(?2)"
    )
    hist = {
        int(r.n_matches): int(r.n)
        for r in cnt.groupBy("n_matches")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {0: n_arch[1], 1: n_arch[0] + n_arch[3], 2: n_arch[2]}
    out["count_regex"] = {
        "sec": round(time.time() - t0, 2),
        "ok": hist == {k: v for k, v in want.items() if v},
    }
    if not out["count_regex"]["ok"]:
        out["count_regex"]["got"] = hist
        out["count_regex"]["want"] = want

    t0 = time.time()
    tm = sequence_match(
        ev,
        "user_id",
        ["ts", "event_id"],
        conds,
        "(?1)(?t<3600)(?2)",
        ts_col="ts",
    )
    got_true_t = tm.where("matched").count()
    out["match_automaton_time"] = {
        "sec": round(time.time() - t0, 2),
        "ok": got_true_t == n_arch[0] + n_arch[2] + n_arch[3],
    }

    out["all_ok"] = all(
        out[k]["ok"]
        for k in ("match_regex", "count_regex", "match_automaton_time")
    )
    print(json.dumps(out))
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
