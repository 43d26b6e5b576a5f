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
UNRESOLVED_ROUTINE in this env), so the engine builds its own on the
same design: partition-partial bitmaps via ``mapInPandas`` (one
``m/8``-byte row per partition, OR-reduced in a single final task),
and double-hashed probes g_i(x) = h1 + i·h2 (Kirsch & Mitzenmacher
2006) over a 64-bit input hash computed JVM-side with ``xxhash64``.
The probe side is pure JVM codegen since r16 (guide §4.1): the bitmap
is an array<bigint> literal in the plan and the k bit-tests are
shift/mask expressions — no Python worker anywhere on the per-batch
screening path (the build's numpy bit-scatter keeps its vectorized
``mapInPandas``, one Python pass per partition at build time only).

Memory bounds, stated: the build moves P partial bitmaps (P·m/8
bytes) through one shuffle and collects ONE bitmap to the driver; the
probe embeds the bitmap in the serialized plan up to
``LITERAL_MAX_BYTES`` (16 MiB) and above that switches to a
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


def build_bloom(df: DataFrame, hash_col: str, m_bits: int, k: int) -> bytes:
    """Build the bitmap over ``df[hash_col]`` (a 64-bit integer column,
    typically ``F.xxhash64(...)``).  m_bits must be a multiple of 8."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8

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
