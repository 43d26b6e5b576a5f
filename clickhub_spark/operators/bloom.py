"""Distributed Bloom-filter membership screening.

The scalable "have we seen this document before?" primitive: a
fixed-size bitmap built once over the historical corpus, broadcast to
every task, probed map-side.  This is the screening tier in front of
the exact-verify join — at 100 TB the history side never re-shuffles
per batch; only the (tiny) bloom-surviving candidates reach the join,
and the filter's false-positive rate is the only extra join traffic.
False NEGATIVES are impossible, so screen→verify is exactly equal to
the plain join (the oracle relation for q_llm_dedup_bloom).

Spark's own BloomFilter lives behind ``bloom_filter_agg`` /
``might_contain``, which Spark 4.1 keeps internal to its runtime
join-filter rewrite (not in the SQL function registry — verified
UNRESOLVED_ROUTINE in this env), so the engine builds its own with
double-hashed probes g_i(x) = h1 + i·h2 (Kirsch & Mitzenmacher 2006)
over a 64-bit input hash computed JVM-side with ``xxhash64``.  Since
r16/r17 BOTH sides are pure JVM on the default path (guide §4.1): the
build explodes the k positions per hash and word-aggregates them
(``groupBy(pos div 64).agg(bit_or(1 << pos%64))``, map-side partials),
and the probe embeds the bitmap as an array<bigint> literal whose k
bit-tests are shift/mask codegen expressions — no Python worker
anywhere on either the build or the per-batch screening path.  (Very
large bitmaps fall back: the build to partition-partial ``mapInPandas``
bitmaps OR-reduced in one task, the probe to a broadcast pandas UDF.)

Memory bounds, stated: the build shuffles at most P·m/64 partial
words (same bound as P partial bitmaps) and collects ≤ m/64 word rows
to the driver; the probe embeds the bitmap in the serialized plan up
to ``LITERAL_MAX_BYTES`` (16 MiB) and above that switches to a
``SparkContext.broadcast`` + vectorized pandas probe (r17) — same
bit arithmetic, same no-false-negative guarantee, shipped once per
executor instead of once per plan.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def optimal_k(m_bits: int, n_items: int) -> int:
    """Probe count minimizing FP rate for m bits / n items: (m/n)·ln2."""
    if n_items <= 0:
        return 1
    return max(1, round(m_bits / n_items * math.log(2)))


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) probe positions from 64-bit hashes via double hashing.
    h2 is forced odd so successive probes cycle the whole table even
    for degenerate h2=0 inputs."""
    u = h.astype(np.int64).view(np.uint64)
    h1 = u & np.uint64(0xFFFFFFFF)
    h2 = (u >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    return ((h1 + i * h2) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


#: above this word count the build keeps the partition-partial-bitmap
#: mapInPandas path: a JVM word-aggregate build must ``collect`` up to
#: m/64 (int, long) Rows, and row-collect overhead beats the two
#: Python stages somewhere in the multi-MiB range.  1M words = 8 MiB
#: bitmap keeps every engine bloom (256-512 KiB → ≤8192 rows) on the
#: zero-Python path.
_JVM_BUILD_MAX_WORDS = 1 << 20


def build_bloom(df: DataFrame, hash_col: str, m_bits: int, k: int) -> bytes:
    """Build the bitmap over ``df[hash_col]`` (a 64-bit integer column,
    typically ``F.xxhash64(...)``).  m_bits must be a multiple of 8.

    r17 (guide §4.1, the BUILD side this time): the eager build job
    used to run TWO Python stages — mapInPandas partition-partial
    bitmaps, then a groupBy().applyInPandas OR-reduce — costing ~3 s
    of Arrow/worker round-trips per build at sf0.1.  The default path
    is now pure JVM: the same double-hash positions the probe computes
    (h1 = h & 0xFFFFFFFF, h2 = (h >>> 32) | 1, pos_i = (h1 + i·h2) %
    m_bits — exact in int64, operands < 2^36) explode k-wide, reduce
    via ``groupBy(pos div 64).agg(bit_or(1 << pos % 64))`` (map-side
    partial aggregation bounds the shuffle at P·m/64 words — the SAME
    bound as the old partial bitmaps), and the driver assembles the
    ≤ m/64 collected (word_idx, word) rows into little-endian int64
    words — byte-identical to the numpy path (bit j of word w is byte
    w·8 + j>>3, mask 1 << (j & 7); pinned by the partition-invariance
    and no-false-negative tests).  Bitmaps above
    ``_JVM_BUILD_MAX_WORDS`` keep the partial-bitmap Python path,
    whose collect is one m/8-byte row regardless of m."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8
    n_words = (m_bits + 63) // 64
    # NULL hashes are never inserted (matches the probe's NULL = not
    # contained contract; a NaN would poison the numpy int64 view on
    # the partial-bitmap path)
    df = df.where(F.col(hash_col).isNotNull())
    if n_words <= _JVM_BUILD_MAX_WORDS:
        h = F.col(hash_col)
        h1 = h.bitwiseAND(F.lit(4294967295))
        h2 = F.call_function("shiftrightunsigned", h, F.lit(32)).bitwiseOR(
            F.lit(1)
        )
        pos = F.explode(
            F.array(*[(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)])
        ).alias("pos")
        rows = (
            df.select(pos)
            .select(
                (F.col("pos") / F.lit(64)).cast("int").alias("w"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("pos") % F.lit(64)).cast("int"),
                ).alias("b"),
            )
            .groupBy("w")
            .agg(F.bit_or("b").alias("word"))
            .collect()
        )
        buf = np.zeros(n_words, dtype="<i8")
        for r in rows:
            buf[r["w"]] = r["word"]
        return buf.tobytes()[:nbytes]

    def partial(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            h = pdf[hash_col].to_numpy()
            if len(h):
                seen = True
                _set_bits(bm, _positions(h, m_bits, k).ravel())
        if seen:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    partials = df.select(hash_col).mapInPandas(partial, "bitmap BINARY")

    def orall(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.bitwise_or.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitmap"]]
        )
        return pd.DataFrame({"bitmap": [acc.tobytes()]})

    rows = (
        partials.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda _k, pdf: orall(pdf), "bitmap BINARY")
        .collect()
    )
    return bytes(rows[0]["bitmap"]) if rows else bytes(nbytes)


#: above this bitmap size the probe switches from the in-plan literal
#: to a ``SparkContext.broadcast`` pandas probe: a plan-embedded word
#: array is free to parse at 64 KiB but a multi-MiB literal bloats the
#: serialized plan every stage re-broadcasts and the codegen context
#: (r17, VERDICT r16 item 2).  16 MiB keeps every realistic
#: screening-tier bloom (64-512 KiB here) on the zero-Python JVM path.
LITERAL_MAX_BYTES = 16 << 20


def might_contain(
    df: DataFrame,
    hash_col: str,
    bitmap: bytes,
    k: int,
    max_literal_bytes: int | None = None,
) -> DataFrame:
    """Filter to rows whose hash MIGHT be in the bloom (map-side; no
    shuffle).  Guaranteed to keep every true member.  A NULL hash is
    treated as not-contained (dropped) — the build side never inserts
    NULL.

    r16 (guide §4.1 — eliminate the Python boundary): the probe used
    to be a pandas UDF, so EVERY screened row crossed JVM→Arrow→
    Python→JVM just to test k bits (ArrowEvalPython in every consumer
    plan; same-session A/B on q_llm_decontam_bloom's screen+verify
    shape: 3.38 s → 2.28 s exec).  Now the bitmap enters the plan as
    ONE string literal that ``cast(split(...) as array<bigint>)``
    constant-folds into a single array literal during optimization
    (verified: no ``split`` in the optimized plan) — NOT an
    ``array(w0, w1, …)`` SQL text (an 8192-child CreateArray choked
    the analyzer: 21.9 s plan build) and NOT ``F.lit(ndarray)``
    (~5.5 s of py4j per-element conversion).  The k double-hashed
    probes are pure JVM codegen: ``h1 = h & 0xFFFFFFFF``,
    ``h2 = (h >>> 32) | 1``, ``pos_i = (h1 + i*h2) % m_bits`` (exact
    in int64: operands < 2^36) and bit test
    ``(words[pos div 64] >>> (pos % 64)) & 1`` — little-endian int64
    words make this bit-identical to the build side's uint8 indexing
    ``bm[pos >> 3] & (1 << (pos & 7))``, so the positions match
    `_positions` exactly (pinned by the no-false-negative tests).
    The old Arrow float64-null corruption hazard is gone with the
    boundary; the JVM-side isNotNull pre-filter stays (NULL = not
    contained).

    r17 (VERDICT r16 item 2 — the literal's BUILD cost): the word
    array used to enter the plan through ``F.expr("cast(split('…'))")``,
    paying the SQL *parser* ~0.7 s on the ~45 KB expression text per
    plan build.  The same expression tree built through the DSL —
    ``F.split(F.lit(wstr), ",").cast(...)`` — skips the parser (one
    py4j string transfer) and constant-folds to the identical array
    literal.  Bitmaps above ``max_literal_bytes`` (default
    ``LITERAL_MAX_BYTES``) switch to a ``SparkContext.broadcast``
    numpy probe (vectorized Arrow pandas UDF over the SAME
    ``_positions`` helper the build uses, so bit-identity is by
    construction): at that size the plan-embedded literal costs more
    in plan serialization/codegen than one Arrow boundary crossing."""
    if len(bitmap) % 8:
        raise ValueError("bitmap length must be a multiple of 8 bytes")
    if k < 1:
        # a k=0 probe would leave `hit` None below and surface as an
        # opaque df.where(None) failure (ADVICE r16)
        raise ValueError("k must be >= 1")
    m_bits = len(bitmap) * 8
    limit = LITERAL_MAX_BYTES if max_literal_bytes is None else max_literal_bytes
    if len(bitmap) > limit:
        return _might_contain_broadcast(df, hash_col, bitmap, k)
    words = np.frombuffer(bitmap, dtype="<i8")
    wstr = ",".join(str(int(w)) for w in words)
    lit_words = F.split(F.lit(wstr), F.lit(",")).cast("array<bigint>")
    h = F.col(hash_col)
    h1 = h.bitwiseAND(F.lit(4294967295))
    h2 = F.call_function("shiftrightunsigned", h, F.lit(32)).bitwiseOR(F.lit(1))
    hit = None
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % F.lit(m_bits)
        word = F.element_at(lit_words, (pos / F.lit(64)).cast("int") + F.lit(1))
        test = (
            F.call_function("shiftrightunsigned", word, (pos % F.lit(64)).cast("int"))
            .bitwiseAND(F.lit(1)) == F.lit(1)
        )
        hit = test if hit is None else (hit & test)
    return df.where(h.isNotNull()).where(hit)


def _might_contain_broadcast(
    df: DataFrame, hash_col: str, bitmap: bytes, k: int
) -> DataFrame:
    """Probe path for bitmaps too large to embed in the plan: the raw
    bitmap rides a ``SparkContext.broadcast`` (shipped once per
    executor, never re-serialized per stage/plan) and the probe is a
    vectorized Arrow pandas UDF over the SAME ``_positions`` helper
    the build uses — identical bit arithmetic, so screen ⊇ members by
    construction.  Same NULL contract as the literal path (NULL hash
    dropped before the probe)."""
    m_bits = len(bitmap) * 8
    bc = df.sparkSession.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def probe(hs: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        # NULLs are dropped by the isNotNull filter, but the optimizer
        # may evaluate the extracted ArrowEvalPython batch before the
        # null filter lands — probe 0 for them, the filter masks it
        h = hs.fillna(0).to_numpy(dtype=np.int64)
        pos = _positions(h, m_bits, k)
        bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=0))

    h = F.col(hash_col)
    return df.where(h.isNotNull()).where(probe(h))
