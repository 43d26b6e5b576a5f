"""Registry + driver-contract sanity."""

import __spark_entry__ as entrymod
from clickhub_spark.plans import all_specs

from tests.conftest import SF_DIR


def test_every_query_has_builder_and_doc():
    specs = all_specs()
    assert len(specs) >= 40
    for name, spec in specs.items():
        assert name.startswith("q_")
        assert callable(spec.builder)
        assert spec.doc, f"{name} lacks a docstring"


def test_oracle_map_is_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle-less query is one of the documented engine-internal ops
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "q_agg_approx_distinct",
        "q_llm_dedup_minhash",
        "q_llm_simhash",
        "q_llm_knn_lsh",
        "q_agg_approx_quantile",
        "q_llm_knn_ivf",
        "q_agg_uniq_state",
        "q_llm_knn_pq",
        # eigendecomposition has no DuckDB oracle; pinned by
        # tests/test_pca.py (≡ numpy fit + invariants)
        "q_llm_pca",
        # iterative IRLS fit is not one SQL statement; pinned by
        # tests/test_glm.py (≡ numpy IRLS to 1e-8 + invariants)
        "q_llm_logreg_fit",
        # q_llm_bpe_train and q_agg_lttb_exact moved to value-oracled
        # in r13: recursive-CTE DuckDB transcriptions of the merge
        # loop / greedy recurrence (VERDICT r12 item 4)
    }


def test_round_priority_front_loads_window(monkeypatch):
    """Driver windows verify a prefix: ROUND_PRIORITY names must lead,
    SPARK_GRAFT_QUERY_ORDER must override, and neither may drop or
    duplicate a registration."""
    from clickhub_spark.plans import registry

    names = list(all_specs())
    want = [n for n in registry.ROUND_PRIORITY if n in names]
    assert names[: len(want)] == want
    assert len(names) == len(set(names)) == len(registry._REGISTRY)

    monkeypatch.setenv("SPARK_GRAFT_QUERY_ORDER", "q_agg_count,q_join_inner")
    override = list(all_specs())
    assert override[:2] == ["q_agg_count", "q_join_inner"]
    assert sorted(override) == sorted(names)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_column_names_match_oracle_aliases(spark):
    """Driver compares columns sorted by name — builders must not leak
    unaliased aggregate names like sum(l_quantity)."""
    for name, spec in all_specs().items():
        df = spec.builder(spark, SF_DIR)
        for c in df.columns:
            assert "(" not in c, f"{name} has unaliased column {c}"


def test_round_priority_rotation_bounds_staleness():
    """VERDICT r10 #7: the driver verifies only the first 50 names of
    ROUND_PRIORITY each round.  This gate makes a skipped rotation a
    RED TEST instead of a judge catch: simulating the upcoming driver
    run over the committed prefix, no registered query may end up more
    than MAX_AGE rounds behind the newest CORRECTNESS file, and any
    never-checked query must sit inside the window.

    MAX_AGE is 7, not the steady-state 6 (~297 names / 50 per
    round), because round 9 skipped rotation and left a backlog one
    50-slot window cannot clear.  The round-12 window drains the
    last of it: the nine r4 names lead (judge-re-verified at sf0.1
    in the r11 session), then new round-12 registrations, then r5
    names fill the window.  The r5 names deferred past the window
    sit at exactly 7 rounds stale in this simulation and MUST lead
    the round-13 window; the backlog shrinks each round (8 -> 4 ->
    0) until steady-state rotation keeps everything within 6 <= 7."""
    import json
    import re
    from pathlib import Path

    from clickhub_spark.plans.registry import ROUND_PRIORITY

    repo = Path(__file__).resolve().parent.parent
    rounds = {}
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p.name)
        rounds[int(m.group(1))] = json.loads(p.read_text())
    if not rounds:
        return  # fresh clone without driver artifacts: nothing to gate
    latest = {}
    for rnd in sorted(rounds):
        for name in rounds[rnd]:
            latest[name] = rnd
    registered = list(entrymod.queries())
    assert sorted(set(ROUND_PRIORITY)) == sorted(registered), (
        "ROUND_PRIORITY must cover the registry exactly once"
    )
    window = set(ROUND_PRIORITY[:50])
    next_round = max(rounds) + 1
    stale = []
    for name in registered:
        simulated = next_round if name in window else latest.get(name)
        if simulated is None:
            stale.append(f"{name}: never driver-checked and not in window")
        elif next_round - simulated > 7:
            stale.append(
                f"{name}: would be {next_round - simulated} rounds stale "
                f"(last row r{simulated})"
            )
    assert not stale, (
        "rotate ROUND_PRIORITY (tools/staleness.py):\n" + "\n".join(stale)
    )
