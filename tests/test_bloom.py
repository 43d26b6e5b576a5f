"""Bloom screening (operators/bloom.py): the no-false-negative
guarantee, a false-positive-rate ceiling, screen→verify ≡ exact join,
and the build's partial-bitmap OR reduction."""

import math

from pyspark.sql import functions as F

from clickhub_spark.operators import bloom

M_BITS, K = 1 << 18, 6


def _hashed(spark, lo, hi, salt=""):
    return spark.range(lo, hi).select(
        F.col("id"), F.xxhash64(F.concat(F.col("id").cast("string"), F.lit(salt))).alias("h")
    )


def test_no_false_negatives(spark):
    members = _hashed(spark, 0, 2000)
    bm = bloom.build_bloom(members, "h", M_BITS, K)
    kept = bloom.might_contain(members, "h", bm, K)
    assert kept.count() == 2000


def test_false_positive_rate_bounded(spark):
    members = _hashed(spark, 0, 2000)
    bm = bloom.build_bloom(members, "h", M_BITS, K)
    # disjoint probe population (different salt => different hashes)
    probes = _hashed(spark, 0, 20_000, salt="|probe")
    fp = bloom.might_contain(probes, "h", bm, K).count()
    # theoretical fp for n=2000, m=2^18, k=6 is ~2e-7; allow lots of
    # slack — anything near 1% means probing or bit-setting is broken.
    assert fp / 20_000 < 0.01


def test_screen_then_verify_equals_exact_join(spark):
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    history = docs.where(F.col("doc_id") >= 100)
    batch = docs.where(F.col("doc_id") < 300).withColumn(
        "h", F.xxhash64("text")
    )
    bm = bloom.build_bloom(
        history.select(F.xxhash64("text").alias("h")), "h", M_BITS, K
    )
    screened = (
        bloom.might_contain(batch, "h", bm, K)
        .join(history.select("text").distinct(), "text", "left_semi")
        .select("doc_id")
    )
    exact = batch.join(
        history.select("text").distinct(), "text", "left_semi"
    ).select("doc_id")
    assert sorted(r.doc_id for r in screened.collect()) == sorted(
        r.doc_id for r in exact.collect()
    )


def test_build_is_partition_invariant(spark):
    df = _hashed(spark, 0, 1000)
    bm1 = bloom.build_bloom(df.repartition(1), "h", M_BITS, K)
    bm8 = bloom.build_bloom(df.repartition(8), "h", M_BITS, K)
    assert bm1 == bm8


def test_empty_build_matches_nothing(spark):
    empty = _hashed(spark, 0, 0)
    bm = bloom.build_bloom(empty, "h", M_BITS, K)
    assert len(bm) == M_BITS // 8 and not any(bm)
    probes = _hashed(spark, 0, 100)
    assert bloom.might_contain(probes, "h", bm, K).count() == 0


def test_optimal_k():
    assert bloom.optimal_k(1 << 18, 2000) == round((1 << 18) / 2000 * math.log(2))
    assert bloom.optimal_k(8, 10_000) == 1
    assert bloom.optimal_k(8, 0) == 1


def test_k_below_one_rejected(spark):
    # ADVICE r16: k=0 used to leave the probe predicate None and die
    # inside df.where(None); now an explicit contract error.
    import pytest

    members = _hashed(spark, 0, 10)
    bm = bloom.build_bloom(members, "h", M_BITS, K)
    with pytest.raises(ValueError, match="k must be >= 1"):
        bloom.might_contain(members, "h", bm, 0)


def test_broadcast_probe_path_matches_literal_path(spark):
    # r17 size gate: bitmaps above max_literal_bytes probe through a
    # SparkContext.broadcast pandas UDF instead of the in-plan
    # literal.  Same bit arithmetic => identical survivor sets (both
    # members and the FP behaviour on non-members must agree
    # bit-for-bit), and nulls keep the dropped-not-crashed contract.
    members = _hashed(spark, 0, 2000)
    bm = bloom.build_bloom(members, "h", M_BITS, K)
    probes = _hashed(spark, 0, 5000, salt="|bcast").union(members)
    lit = bloom.might_contain(probes, "h", bm, K)
    bc = bloom.might_contain(probes, "h", bm, K, max_literal_bytes=0)
    bc_plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in bc_plan  # really the broadcast pandas path
    assert sorted(r.id for r in lit.collect()) == sorted(
        r.id for r in bc.collect()
    )
    nulled = probes.withColumn(
        "h", F.when(F.col("id") % 2 == 0, F.col("h"))
    )
    lit_n = sorted(r.id for r in bloom.might_contain(nulled, "h", bm, K).collect())
    bc_n = sorted(
        r.id
        for r in bloom.might_contain(
            nulled, "h", bm, K, max_literal_bytes=0
        ).collect()
    )
    assert lit_n == bc_n


def test_jvm_build_matches_python_build(spark):
    # r17: the default build path is a pure-JVM explode + bit_or word
    # aggregate (zero Python stages); bitmaps above
    # _JVM_BUILD_MAX_WORDS keep the partial-bitmap mapInPandas path.
    # The two must be byte-identical — same double-hash positions,
    # same little-endian word layout — including on non-64-multiple
    # byte lengths and with NULL hashes present on the build side.
    df = _hashed(spark, 0, 3000).withColumn(
        "h", F.when(F.col("id") % 7 != 0, F.col("h"))
    )  # ~14% NULL hashes: both paths must skip them
    old = bloom._JVM_BUILD_MAX_WORDS
    try:
        for m_bits in (M_BITS, 1 << 10, 8 * 3):  # 24 bits: partial word
            bloom._JVM_BUILD_MAX_WORDS = 1 << 20
            bm_jvm = bloom.build_bloom(df, "h", m_bits, K)
            bloom._JVM_BUILD_MAX_WORDS = 0
            bm_py = bloom.build_bloom(df, "h", m_bits, K)
            assert bm_jvm == bm_py and len(bm_jvm) == m_bits // 8
    finally:
        bloom._JVM_BUILD_MAX_WORDS = old


def test_null_hashes_dropped_not_crashed(spark):
    # ADVICE r5: a NULL in hash_col used to NaN-poison the probe
    # batch (int64 view raised, killing the task).  Nulls must be
    # treated as not-contained; non-null rows keep exact semantics.
    members = _hashed(spark, 0, 100)
    bm = bloom.build_bloom(members, "h", M_BITS, K)
    probes = members.withColumn(
        "h", F.when(F.col("id") % 3 == 0, F.col("h"))
    )  # 2/3 of hashes nulled
    kept = bloom.might_contain(probes, "h", bm, K)
    ids = sorted(r.id for r in kept.collect())
    assert ids == [i for i in range(100) if i % 3 == 0]
