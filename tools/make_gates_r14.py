"""Assemble GATES_r14.json from the final-tree gate logs plus the
round's scale artifacts (TPCH 100x with the bucketed-Q3 layout, ANN
recall certification at 10M vectors, partition-pruned mutations).

Usage: python tools/make_gates_r14.py <sf001_engine.log> \
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
    cluster = json.load(open("/root/repo/CLUSTER_GATE_r14.json"))
    tpch = json.load(open("/root/repo/TPCH_100X_r14.json"))
    ann = json.load(open("/root/repo/ANN_SCALE_r14.json"))
    pruned = json.load(open("/root/repo/MUTATION_PRUNED_r14.json"))
    doc = {
        "round": 14,
        "note": (
            "Final-tree verification (sequence per the verify skill: "
            "plan_guard refresh + empty fingerprint diff first, then "
            "full pytest, then the oracle gates). 333 registered "
            "queries, 5 new this round: q_ch_sql_battery7/7b/7c "
            "(probe battery 7 — GROUP BY WITH ROLLUP/CUBE modifier "
            "spelling, GROUP BY ALL, named WINDOW clause, DISTINCT "
            "ON rewrite, LIMIT n OFFSET m BY — each with an "
            "INDEPENDENT DuckDB-native oracle), q_ch_sql_battery8 "
            "(GROUP BY ALL WITH TOTALS — the battery-8 composition "
            "that found a real expansion bug), and q_ch_ddl_partition "
            "(IN PARTITION mutations + DROP PARTITION, hand-computed "
            "oracle). Five ADVICE r13 "
            "defects fixed (WITH TIES false positives, UPDATE "
            "pre-mutation assignment order, window-position -If "
            "combinators, nested any() renders, strict HTTP "
            "claim_key CAS). The copy-on-write swap is now ONE "
            "atomic renameat2 RENAME_EXCHANGE (path never missing to "
            "readers; one-generation parking for in-flight scans). "
            "New statement surface: ALTER TABLE DELETE/UPDATE IN "
            "PARTITION + DROP PARTITION via the partition-pruned "
            "rewrite. ROUND_PRIORITY rotated: the full 37-name "
            "r6-stale block leads the driver window."
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
            "TPCH_100X_r14": {
                "q1_scaling": tpch["q1_scaling"],
                "q6_scaling": tpch["q6_scaling"],
                "q3_scaling": tpch["q3_scaling"],
                "q3_bucketed_scaling": tpch["q3_bucketed_scaling"],
                "q3_bucketed_exchanges": tpch["plan_fingerprints"][
                    "q3_bucketed_100x"
                ].get("Exchange", 0),
                "gates_ok": tpch["gates_ok"],
            },
            "ANN_SCALE_r14": {
                "n_vectors": ann["n_vectors"],
                "ivf_recall_ge_050": ann["ivf"]["recall_ge_050"],
                "ivf_pruned_le_050": ann["ivf"]["pruned_le_050"],
                "pq_rerank_recall_ge_060": ann["pq_rerank"][
                    "recall_ge_060"
                ],
                "lsh_recall_ge_040": ann["lsh"]["recall_ge_040"],
                "gates_ok": ann["gates_ok"],
            },
            "MUTATION_PRUNED_r14": {
                "rows_big": pruned["big"]["rows"],
                "delete_scaling_10x": pruned["delete_scaling_10x"],
                "update_scaling_10x": pruned["update_scaling_10x"],
                "gates_ok": pruned["gates_ok"],
            },
        },
    }
    with open("/root/repo/GATES_r14.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["gates"]))


if __name__ == "__main__":
    main()
