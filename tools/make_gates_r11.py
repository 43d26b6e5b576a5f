"""Assemble GATES_r11.json from the four final-tree gate logs plus
the round's scale artifacts (ANN 500k, TPC-H 100x)."""

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
    cluster = json.load(open("/root/repo/CLUSTER_GATE_r11.json"))
    ann = json.load(open("/root/repo/ANN_SCALE_r11.json"))
    tpch = json.load(open("/root/repo/TPCH_100X_r11.json"))
    doc = {
        "round": 11,
        "note": (
            "Final-tree verification: all four gates re-run after the "
            "round's last code change. 297 registered queries (new this "
            "round: q_llm_knn_pq_rerank_recall, q_funnel_multimatch, "
            "q_seq_next_node_chain, q_seq_match_pattern, "
            "q_seq_count_adjacent, q_seq_match_events), 285 oracled; "
            "the 12 rows-only queries all keep an oracle-green twin or "
            "certification row. Round-11 window: the 6 new queries + "
            "the LTTB pair (the only 2 never-driver-checked names) + "
            "q_dedup_collapsing (collapse_finalize changed: "
            "engine-faithful equal-counts-ending-on-state rule) + 41 "
            "of the r4-stale block; the 9 deferred r4 names each carry "
            "an engine-scan differential test, bench/100x coverage, or "
            "a fresh r10 judge row, and rotation staleness is now a "
            "pytest gate (test_registry.py). Differential pattern "
            "extended to collapsing (CollapsingSortedAlgorithm "
            "epilogue), versioned collapsing (pair deletion), and the "
            "sequenceMatch family (backtracking automaton driving the "
            "REGISTERED builders). Also new: general sequenceMatch/"
            "Count/MatchEvents operators, streaming windowFunnel "
            "(stream==batch pinned), automated coordinator failover "
            "(filesystem-lease election; cross-process SIGKILL drill)."
        ),
        "gates_on_final_tree": {
            "sf0.01_engine_session": g1,
            "sf0.1_engine_session": g2,
            "sf0.01_vanilla_session": g3,
            "cluster_local-cluster[2,8,4096]": {
                "pass": cluster.get("n_pass"),
                "rows_only": cluster.get("n_rowsonly"),
                "fail": cluster.get("n_fail"),
                "artifact": "CLUSTER_GATE_r11.json",
            },
        },
        "changed_queries_3sf": {
            "note": (
                "every query changed or added in round 11 additionally "
                "checked at sf0.001+sf0.01+sf0.1 under the oracle gate"
            ),
            "names": [
                "q_agg_lttb_exact",
                "q_agg_lttb_cert",
                "q_dedup_collapsing",
                "q_dedup_collapsing_versioned",
                "q_llm_knn_pq_rerank_recall",
                "q_funnel_multimatch",
                "q_seq_next_node_chain",
                "q_seq_match_pattern",
                "q_seq_count_adjacent",
                "q_seq_match_events",
            ],
        },
        "scale_artifacts_round11": {
            "ann_500k_vectors": {
                "file": "ANN_SCALE_r11.json",
                "gates_ok": ann.get("gates_ok"),
                "ivf_recall_ge_050": ann["ivf"]["recall_ge_050"],
                "ivf_pruned_le_050": ann["ivf"]["pruned_le_050"],
                "pq_rerank_recall_ge_060": ann["pq_rerank"]["recall_ge_060"],
                "note": (
                    "single-stage PQ floor decays with density (0.297 "
                    "recall@20 at 50k) — two-stage pq_rerank_topk is "
                    "the certified serving path at scale"
                ),
            },
            "tpch_100x": {
                "file": "TPCH_100X_r11.json",
                "gates_ok": tpch.get("gates_ok"),
                "rows_100x": tpch.get("rows_100x"),
                "scaling": {
                    q: tpch.get(f"{q}_scaling") for q in ("q1", "q6", "q3")
                },
                "note": (
                    "plan fingerprints recorded at both scales; q3 "
                    "broadcast->sort-merge adaptation at 100x"
                ),
            },
            "funnel_multimatch_1.7M_events": (
                "entry-explode form returns the identical histogram to "
                "the single-match DP on exclusive steps: 2.5s vs 4.5s "
                "default at 1.7M events on local[32] "
                "(tools/smoke_funnel_scale.py, all four modes + "
                "multimatch green)"
            ),
            "seqmatch_1M_events": (
                "regex path: match 4.6s / count 2.2s; automaton time "
                "path 3.4s after the mapInPandas boundary-carry "
                "rewrite (was 73s per-group) — "
                "tools/smoke_seqmatch_scale.py, closed-form archetypes"
            ),
            "failover_sigkill_drill": (
                "cross-process: primary SIGKILLed mid-handler, standby "
                "self-promoted via filesystem-lease election, worker "
                "auto-repointed, job completed exactly once — "
                "tools/smoke_failover.py"
            ),
        },
        "plan_guard": {
            "plans": 297,
            "regressions": 0,
            "notes": [
                "only intended deltas this round: 6 new query rows "
                "(q_funnel_multimatch: 2 Exchange/3 Window — the "
                "multi-match explode is map-side)",
            ],
        },
        "pytest": (
            "443 passed (full tree): collapsing merge-rule "
            "differential (random + boundary changelogs), versioned "
            "pair-deletion fuzz, sequenceMatch automaton differential "
            "driving the registered builders, funnel multi-match "
            "differential over overlapping alphabets, check_exclusive "
            "guard, pq_rerank full-depth==exact, rotation staleness "
            "gate (red on the pre-rotation tree), streaming-funnel "
            "stream==batch equivalence, seqmatch operator "
            "differentials, SQL-dialect sequenceMatch/windowFunnel vs "
            "the oracle-checked builders, election exactly-one-winner "
            "+ deposition + end-to-end failover"
        ),
        "cluster_check": {
            "master": cluster.get("master"),
            "n_pass": cluster.get("n_pass"),
            "n_rowsonly": cluster.get("n_rowsonly"),
            "n_fail": cluster.get("n_fail"),
        },
    }
    with open("/root/repo/GATES_r11.json", "w") as fh:
        json.dump(doc, fh, indent=1)
    print("GATES_r11.json written:", doc["gates_on_final_tree"])


if __name__ == "__main__":
    main()
