"""Assemble GATES_r15.json from the final-tree gate logs plus the
round's scale/arbitration artifacts (partition lifecycle flat-time,
bench arbitration with the pipeline calibration extension).

Usage: python tools/make_gates_r15.py <sf001_engine.log> \
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
    cluster = json.load(open("/root/repo/CLUSTER_GATE_r15.json"))
    plife = json.load(open("/root/repo/PARTITION_LIFECYCLE_r15.json"))
    barb = json.load(open("/root/repo/BENCH_ARBITRATION_r15.json"))
    doc = {
        "round": 15,
        "note": (
            "Final-tree verification (sequence per the verify skill: "
            "plan_guard refresh + empty fingerprint diff first, then "
            "full pytest, then the oracle gates). 341 registered "
            "queries, 8 new this round: probe battery 9 — "
            "q_ch_sql_battery9/9b/9f (ARRAY JOIN multi-zip, bare "
            "form, LEFT-with-empties — DuckDB multi-unnest oracles), "
            "q_ch_sql_battery9c (WITH TOTALS + HAVING totals-row "
            "existence vs a hand-built UNION ALL oracle), "
            "q_ch_sql_battery9d (SAMPLE k OFFSET m as a declared-key "
            "md5 hash-range slice, membership-pinned), "
            "q_ch_sql_battery9e (untuple + tuple .N access), "
            "q_ch_ddl_alter (RENAME/MODIFY COLUMN + DETACH/ATTACH/"
            "DROP PARTITION flow, hand-computed oracle), and "
            "q_ch_sql_battery10 (COLUMNS('regex') APPLY dynamic "
            "column selector). All five "
            "ADVICE r14 items fixed; the three verdict-flagged "
            "literal-corruption passes (ARRAY JOIN, WITH TOTALS, "
            "FINAL) are literal-span guarded with a hypothesis "
            "property test; nested same-name calls now rewrite in "
            "every call render; q_llm_knn_pq serves the certified "
            "two-stage path. New statement surface: ALTER TABLE "
            "MODIFY/RENAME COLUMN, DETACH/ATTACH PARTITION, "
            "system.detached_parts, CREATE ... SAMPLE BY. "
            "End-of-round code review found and fixed 10 defects "
            "(3 data-loss class: mutation reads over mixed-name "
            "files, ADD COLUMN ghost data, detached-partition "
            "history clears). ROUND_PRIORITY rotated: the 36-name "
            "r7-stale block leads; the r9 block head pre-drains."
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
            "PARTITION_LIFECYCLE_r15": {
                "rows_10x": plife["scales"]["10x"]["rows_total"],
                "detach_sec_10x": plife["scales"]["10x"]["detach_sec"],
                "attach_sec_10x": plife["scales"]["10x"]["attach_sec"],
                "drop_sec_10x": plife["scales"]["10x"]["drop_sec"],
                "flat_gate_pass": plife["flat_gate"]["pass"],
            },
            "BENCH_ARBITRATION_r15": {
                "verdict": "ambient",
                "tpch_min_vs_r14_pinned": [
                    barb["totals"]["tpch_min"],
                    barb["totals"]["tpch_r14_pinned"],
                ],
                "pipeline_min_vs_r14_pinned": [
                    barb["totals"]["pipeline_min"],
                    barb["totals"]["pipeline_r14_pinned"],
                ],
                "per_query_regressions_gt_1p3x": barb[
                    "per_query_regressions_gt_1p3x"
                ],
                "pipeline_baseline_rows_added": 45,
            },
        },
    }
    with open("/root/repo/GATES_r15.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["gates"]))


if __name__ == "__main__":
    main()
