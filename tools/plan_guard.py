"""Plan-fingerprint guard — automated plan hygiene for EVERY
registered query, not just the hand-pinned ones in test_plans.py.

For each query the guard records a small fingerprint of the ANALYZED
physical plan: counts of shuffle Exchanges, joins by strategy,
Windows, scans, python boundaries, plus the cartesian/loop-join red
flags.  The snapshot (PLAN_FINGERPRINTS.json) is committed;
tests/test_plan_guard.py fails when a query's plan REGRESSES against
it — more Exchanges, a broadcast join degrading to shuffle, a new
CartesianProduct — catching silent Catalyst-interaction regressions
that value-checking cannot see.

Usage:
  python tools/plan_guard.py            # refresh the snapshot
  python tools/plan_guard.py --check    # exit 1 on regressions
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

SNAPSHOT = "/root/repo/PLAN_FINGERPRINTS.json"
SF_DIR = "/root/testdata/sf0.001"

#: operator classes counted per plan (formatted-mode detail headers)
COUNTED = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "Scan parquet",
]

#: regressions worth failing on: fingerprint field -> reason
WORSE_IF_MORE = {
    "Exchange": "extra shuffle",
    "CartesianProduct": "cartesian product appeared",
    "BroadcastNestedLoopJoin": "nested-loop join appeared",
    "SortMergeJoin": "broadcast/shuffled-hash degraded to sort-merge",
    "BatchEvalPython": "row-at-a-time Python UDF appeared",
    "UnpartitionedWindow": "unpartitioned (SinglePartition) window appeared",
}

#: Queries ALLOWED to carry an unpartitioned window (VERDICT r5 item
#: 3).  A window with no PARTITION BY plans Exchange SinglePartition —
#: one task sorts the whole input — so every entry here must document
#: why that input is BOUNDED (already aggregated, or the documented
#: cross-engine oracle canon whose production twin is plan-tested).
#: Any query not listed here with UnpartitionedWindow > 0 is a HARD
#: --check failure even if the snapshot agrees.
UNPARTITIONED_WINDOW_CANON = {
    # documented oracle canon: global running sum IS the packing
    # spec; sharded production twin q_llm_pack_sharded is plan-tested
    # SinglePartition-free (tests/test_plans.py)
    "q_llm_pack",
    # cumulative window over a per-VALUE aggregated table (distinct
    # scores/values ≪ rows) — the q_llm_score_normalize technique;
    # the corpus-sized input never passes through the window
    "q_llm_score_normalize",
    "q_agg_ks_test",
    "q_agg_mannwhitney",
    # Spearman: midranks for each variable via cumulative windows over
    # that variable's distinct-value table (same aggregated-input
    # technique as q_agg_ks_test), broadcast-joined back to the facts
    "q_agg_spearman",
    # Kendall tau-b: strictly-below/above cumulative counts down the
    # value axis of the PIVOTED distinct-value table (8 bucket
    # columns) — aggregated input, corpus never enters the window
    "q_agg_kendall",
}
# (A round-6 scan of every registered plan found unpartitioned window
# specs in exactly these queries — every other window in the registry
# is partitioned.)


def fingerprint(plan: str) -> dict[str, int]:
    ops = re.findall(r"^\(\d+\) ([A-Za-z ]+[A-Za-z])", plan, re.M)
    fp = {}
    for name in COUNTED:
        n = sum(
            1
            for o in ops
            if o == name or o.startswith(name + " ")
        )
        if name == "Exchange":
            # count only shuffle exchanges; broadcast counted separately
            n = sum(1 for o in ops if o == "Exchange")
        if n:
            fp[name] = n
    # Unpartitioned windows: a windowspecdefinition whose FIRST
    # argument is an ordering spec (col ASC/DESC NULLS ...) has no
    # partition columns -> the Window's child is Exchange
    # SinglePartition.  Partitioned specs lead with bare partition
    # expressions instead.  (Counting specs, not Window operators: one
    # Window op can evaluate several specs; any unpartitioned spec
    # forces the single-partition distribution.)
    n_unpart = len(
        re.findall(r"windowspecdefinition\(\S+ (?:ASC|DESC) NULLS", plan)
    )
    if n_unpart:
        fp["UnpartitionedWindow"] = n_unpart
    return fp


def collect() -> dict[str, dict[str, int]]:
    from clickhub_spark.plans import all_specs
    from clickhub_spark.session import get_spark

    spark = get_spark("plan-guard", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = {}
    for name, spec in sorted(all_specs().items()):
        try:
            df = spec.builder(spark, SF_DIR)
            out[name] = fingerprint(
                df._jdf.queryExecution().explainString(mode)
            )
        except Exception as e:  # a builder that cannot plan is itself a finding
            out[name] = {"__error__": 1, "__msg__": str(e)[:120]}
    return out


def compare(old: dict, new: dict) -> list[str]:
    problems = []
    for name, fp_new in new.items():
        fp_old = old.get(name)
        # hard floor, snapshot-independent: an unpartitioned window is
        # only legal on the documented-canon list, even for a brand-new
        # query or one whose snapshot already carried it
        if (
            fp_new.get("UnpartitionedWindow", 0) > 0
            and name not in UNPARTITIONED_WINDOW_CANON
        ):
            problems.append(
                f"{name}: unpartitioned window (Exchange SinglePartition sort) "
                f"not in UNPARTITIONED_WINDOW_CANON — partition it or document "
                f"why its input is bounded"
            )
        if fp_old is None:
            continue  # new query: no baseline yet
        if "__error__" in fp_new and "__error__" not in fp_old:
            problems.append(f"{name}: builder now fails to plan")
            continue
        for field, reason in WORSE_IF_MORE.items():
            if fp_new.get(field, 0) > fp_old.get(field, 0):
                problems.append(
                    f"{name}: {reason} ({field} "
                    f"{fp_old.get(field, 0)} -> {fp_new.get(field, 0)})"
                )
    return problems


def main() -> int:
    new = collect()
    if "--check" in sys.argv:
        with open(SNAPSHOT) as f:
            old = json.load(f)
        problems = compare(old, new)
        for p in problems:
            print("REGRESSION:", p)
        print(f"{len(new)} plans checked, {len(problems)} regressions")
        return 1 if problems else 0
    with open(SNAPSHOT, "w") as f:
        json.dump(new, f, indent=1, sort_keys=True)
    n_err = sum(1 for fp in new.values() if "__error__" in fp)
    print(f"snapshot: {len(new)} plans -> {SNAPSHOT} ({n_err} plan errors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
