"""Distributed BPE training (operators/bpe.py): the distributed
trainer must reproduce the single-process reference implementation
EXACTLY (merge-for-merge), apply must match the reference
segmentation, and tokenization must be lossless + compressive."""

import pytest
from pyspark.sql import functions as F

from clickhub_spark.operators.bpe import (
    EOW,
    apply_bpe,
    reference_bpe,
    train_bpe,
    word_freq_table,
)
from tests.conftest import SF_DIR

N_MERGES, MAX_WORDS = 15, 2000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def merges(spark, docs):
    return train_bpe(docs, "text", n_merges=N_MERGES, max_words=MAX_WORDS)


def test_char_split_has_no_empty_symbols(spark, docs):
    words = word_freq_table(docs, "text", 50)
    syms = words.select(
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("s")
    ).collect()
    for r in syms:
        assert "" not in r.s


def test_distributed_training_equals_reference(spark, docs, merges):
    texts = [r.text for r in docs.collect()]
    ref = reference_bpe(texts, N_MERGES, MAX_WORDS)
    assert merges == ref


def test_training_is_partition_invariant(spark, docs, merges):
    again = train_bpe(docs.repartition(16), "text", N_MERGES, MAX_WORDS)
    assert again == merges


def test_apply_matches_reference_segmentation(spark, docs, merges):
    sample = docs.orderBy("doc_id").limit(20)
    rows = apply_bpe(sample, merges, "text").orderBy("doc_id").collect()
    from clickhub_spark.operators.bpe import _merge_once

    for r in rows:
        expect = []
        for w in r.text.lower().split():
            syms = list(w) + [EOW]
            for left, right in merges:
                syms = _merge_once(syms, left, right)
            expect.extend(syms)
        assert list(r.bpe_tokens) == expect


def test_tokenization_lossless_and_compressive(spark, docs, merges):
    rows = apply_bpe(docs.limit(50), merges, "text").collect()
    for r in rows:
        # lossless: joining tokens and stripping EOW reconstructs the
        # lowercased whitespace-normalized text
        joined = "".join(r.bpe_tokens).replace(EOW, " ").strip()
        assert joined == " ".join(r.text.lower().split())
        # compressive: merges shorten sequences vs pure chars
        n_chars = sum(len(w) + 1 for w in r.text.lower().split())
        assert len(r.bpe_tokens) < n_chars


def test_merges_are_nonempty_and_orderly(merges):
    assert len(merges) == N_MERGES
    assert all(isinstance(l, str) and isinstance(r, str) for l, r in merges)


def test_distributed_tier_equals_driver_tier(spark, docs, merges):
    # driver_merge_cap=0 forces the per-round distributed loop; it
    # must produce the same merge list as the default driver-side
    # incremental tier (which the `merges` fixture now exercises)
    dist = train_bpe(
        docs, "text", n_merges=N_MERGES, max_words=MAX_WORDS, driver_merge_cap=0
    )
    assert dist == merges


def test_incremental_counts_match_recount_on_repeats(spark):
    # 'aaaa'-style words stress the incremental accounting: merging
    # (a,a) rewrites adjacencies non-trivially (left-to-right,
    # non-overlapping) and the inverted index goes stale for the
    # losing words — the guard must skip them without double-counting
    from clickhub_spark.operators.bpe import _train_incremental

    top = [("aaaa", 10), ("aaab", 7), ("abab", 5)]
    inc = _train_incremental(top, 6)
    ref = reference_bpe(["aaaa " * 10 + "aaab " * 7 + "abab " * 5], 6, 100)
    assert inc == ref
