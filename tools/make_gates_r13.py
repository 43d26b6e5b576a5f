"""Assemble GATES_r13.json from the final-tree gate logs plus the
round's scale artifacts (TPCH 100x rerun, MinHash single-scan reshape
at 10M docs, statement-path mutations at 10M rows).

Usage: python tools/make_gates_r13.py <sf001_engine.log> \
       <sf01_engine.log> <sf001_vanilla.log>
"""

from __future__ import annotations

import json
import re
import sys


def tally(path: str) -> dict:
    txt = open(path).read()
    m = re.findall(r"(\d+) pass, (\d+) rows-only, (\d+) fail", txt)
    if not m:
        raise SystemExit(f"no tally in {path}")
    p, r, f = map(int, m[-1])
    return {"pass": p, "rows_only": r, "fail": f}


def main() -> None:
    g1, g2, g3 = (tally(p) for p in sys.argv[1:4])
    cluster = json.load(open("/root/repo/CLUSTER_GATE_r13.json"))
    dedup = json.load(open("/root/repo/DEDUP_100X_r13.json"))
    tpch = json.load(open("/root/repo/TPCH_100X_r13.json"))
    mut = json.load(open("/root/repo/MUTATION_SCALE_r13.json"))
    doc = {
        "round": 13,
        "note": (
            "Final-tree verification (sequence per the verify skill: "
            "plan_guard refresh + empty fingerprint diff first, then "
            "full pytest, then the oracle gates). 328 registered "
            "queries, 4 new this round: q_ch_sql_battery6/6b/6c "
            "(probe-battery-6 compositions — QUALIFY+LIMIT BY+"
            "PREWHERE stacks, empty-set sumIf defaults, expression-"
            "WITH — each with an INDEPENDENT DuckDB-native oracle) "
            "and q_ch_ddl_mutate (literal ALTER UPDATE/DELETE "
            "mutations + the reference importer's KeeperMap claim "
            "flow, hand-computed oracle). Two queries moved "
            "rows-only -> VALUE-ORACLED via recursive-CTE DuckDB "
            "replays (q_agg_lttb_exact greedy recurrence, "
            "q_llm_bpe_train merge loop) — the rows-only set is 10. "
            "ROUND_PRIORITY rotated: the full 35-name r5-stale block "
            "leads the driver window."
        ),
        "gates": {
            "sf0.01_engine_session": g1,
            "sf0.1_engine_session": g2,
            "sf0.01_vanilla_session": g3,
            "sf0.01_local_cluster": {
                "pass": cluster["n_pass"],
                "rows_only": cluster["n_rowsonly"],
                "fail": cluster["n_fail"],
                "master": cluster["master"],
            },
        },
        "scale_artifacts": {
            "TPCH_100X_r13": {
                "q1_scaling": tpch["q1_scaling"],
                "q6_scaling": tpch["q6_scaling"],
                "q3_scaling": tpch["q3_scaling"],
                "gates_ok": tpch["gates_ok"],
            },
            "DEDUP_100X_r13": {
                "docs_big": dedup["docs_big"],
                "scaling": dedup["scaling"],
                "single_corpus_scan": dedup["gates"]["single_corpus_scan"],
                "planted_recall_100pct": dedup["gates"][
                    "planted_recall_100pct"
                ],
                "gates_ok": dedup["gates_ok"],
            },
            "MUTATION_SCALE_r13": {
                "rows": mut["rows"],
                "update_scaling_10x": mut["update_scaling_10x"],
                "delete_scaling_10x": mut["delete_scaling_10x"],
                "gates_ok": mut["gates_ok"],
            },
        },
    }
    with open("/root/repo/GATES_r13.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["gates"]))


if __name__ == "__main__":
    main()
