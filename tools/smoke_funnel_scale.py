"""Scale smoke for windowFunnel (operators/funnel.py, round 10).

The property being demonstrated is the 100 TB one: the mode family's
whole greedy DP is ONE user_id exchange + one per-partition sort + K
chained window passes — cost linear in |events|, parallelism growing
with the user space, state bounded by the step count (never a per-user
event buffer).  The engine's own aggregate state buffers every
matching event per user; this form only ever holds a sort run.

The check is ANALYTIC: users are synthesized in five deterministic
archetypes whose level under every mode is known exactly —

- "clean":    v,c,p strictly increasing, inside the window  → 3/3/3/3
- "broken":   v,x,c,p (interloper after the chain starts)   → 3 default,
              1 strict_order, 3 dedup, 3 increase
- "dup":      v,c,c,p                                       → 3 default,
              3 strict_order (re-match), 2 dedup, 3 increase
- "tied":     v, then c at the SAME timestamp, then p        → 3 default
              (window ties pass), 1 strict_increase
- "premature": v,p,c (p before its previous level exists)    → 2 default
              (p is a no-op, c still chains), 1 strict_order
              (the out-of-order p aborts the scan)

so the per-mode level histograms are closed-form in the archetype
counts and verified with one scalar aggregate each; nothing
corpus-sized reaches the driver.

Usage: python tools/smoke_funnel_scale.py [n_users]   (default 500k
users ≈ 2M events).  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.operators.funnel import window_funnel
    from clickhub_spark.session import get_spark

    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("smoke-funnel")
    spark.sparkContext.setLogLevel("ERROR")

    # archetype = user_id % 5; events generated distributed (no driver
    # lists).  Timestamps: user-specific base + small per-step offsets
    # (all inside the 1-day window); "tied" gives c the SAME ts as v.
    users = spark.range(n_users).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).alias("arch")
    )
    step = users.select(
        "user_id",
        "arch",
        F.explode(
            F.when(
                F.col("arch").isin(1, 2),
                F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3)),
            ).otherwise(F.array(F.lit(0), F.lit(1), F.lit(2)))
        ).alias("pos"),
    )
    # event letter per (arch, pos): clean/tied = v,c,p;
    # broken = v,x,c,p; dup = v,c,c,p; premature = v,p,c
    etype = (
        F.when(F.col("pos") == 0, F.lit("v"))
        .when((F.col("arch") == 1) & (F.col("pos") == 1), F.lit("x"))
        .when((F.col("arch") == 1) & (F.col("pos") == 2), F.lit("c"))
        .when((F.col("arch") == 2) & (F.col("pos").isin(1, 2)), F.lit("c"))
        .when((F.col("arch") == 4) & (F.col("pos") == 1), F.lit("p"))
        .when((F.col("arch") == 4) & (F.col("pos") == 2), F.lit("c"))
        .when(F.col("pos") == 1, F.lit("c"))
        .otherwise(F.lit("p"))
    )
    # seconds offset: position index, except "tied" (arch 3) keeps c
    # at the v timestamp
    offs = F.when(
        (F.col("arch") == 3) & (F.col("pos") == 1), F.lit(0)
    ).otherwise(F.col("pos"))
    ev = step.select(
        "user_id",
        (F.col("user_id") * 100 + F.col("pos")).alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("user_id") % 86_400 + offs
        ).alias("ts"),
        etype.alias("event_type"),
    ).repartition(32)
    n_events = ev.count()

    n_clean, n_broken, n_dup, n_tied, n_prem = (
        (n_users - a + 4) // 5 for a in range(5)
    )
    expect = {
        # level -> count, per mode (derivation in module docstring)
        "default": {3: n_clean + n_broken + n_dup + n_tied, 2: n_prem},
        "strict_order": {
            3: n_clean + n_dup + n_tied,
            1: n_broken + n_prem,
        },
        "strict_dedup": {
            3: n_clean + n_broken + n_tied,
            2: n_dup + n_prem,
        },
        "strict_increase": {
            3: n_clean + n_broken + n_dup,
            1: n_tied,
            2: n_prem,
        },
    }

    out: dict = {"metric": "funnel_scale_smoke", "n_users": n_users, "n_events": n_events}
    ini = F.col("event_type")
    for mode, exp in expect.items():
        t0 = time.time()
        levels = window_funnel(
            ev,
            user_col="user_id",
            order=["ts", "event_id"],
            steps=[ini == "v", ini == "c", ini == "p"],
            ts_col="ts",
            window_s=86_400,
            modes=() if mode == "default" else (mode,),
        )
        hist = {
            int(r["level"]): int(r["n"])
            for r in levels.groupBy("level").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        ok = hist == exp
        out[mode] = {"sec": round(time.time() - t0, 2), "ok": ok}
        if not ok:
            out[mode]["got"] = hist
            out[mode]["want"] = exp
    # multi-match path (round 11): with mutually exclusive steps the
    # entry-explode form must return the IDENTICAL histogram — this
    # run pins that equivalence at n_events scale and measures the
    # explode's overhead vs the plain default run above (semantics
    # under genuinely overlapping conditions are pinned by
    # tests/test_funnel_differential.py::test_differential_multi_match)
    t0 = time.time()
    levels = window_funnel(
        ev,
        user_col="user_id",
        order=["ts", "event_id"],
        steps=[ini == "v", ini == "c", ini == "p"],
        ts_col="ts",
        window_s=86_400,
        multi_match=True,
    )
    hist = {
        int(r["level"]): int(r["n"])
        for r in levels.groupBy("level")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ok = hist == expect["default"]
    out["default_multimatch"] = {"sec": round(time.time() - t0, 2), "ok": ok}
    if not ok:
        out["default_multimatch"]["got"] = hist
        out["default_multimatch"]["want"] = expect["default"]

    out["all_ok"] = (
        all(out[m]["ok"] for m in expect) and out["default_multimatch"]["ok"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
