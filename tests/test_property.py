"""Property-based tests (hypothesis) — randomized invariants the
reference's test suite lacks entirely (SURVEY §5)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhub_spark.operators.dedup import final_view

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=100),  # version
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_final_view_invariants(spark, rows):
    """For ANY multiset of (key, version, value) rows: one row per
    distinct key; each surviving row carries that key's max version;
    the surviving value is the max value among max-version rows (the
    deterministic tie-break)."""
    df = spark.createDataFrame(rows, "k int, ver int, v int")
    out = final_view(df, keys=["k"], version=["ver", "v"]).collect()
    by_key = {}
    for k, ver, v in rows:
        by_key.setdefault(k, []).append((ver, v))
    assert len(out) == len(by_key)
    for r in out:
        assert (r.ver, r.v) == max(by_key[r.k])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_final_view_idempotent(spark, rows):
    """final_view(final_view(x)) == final_view(x) and replay-union is
    absorbed — the ReplacingMergeTree re-import contract."""
    df = spark.createDataFrame(rows, "k int, ver int, v int")
    once = final_view(df, keys=["k"], version=["ver", "v"])
    replay = final_view(
        df.unionByName(df), keys=["k"], version=["ver", "v"]
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, replay.collect()))
