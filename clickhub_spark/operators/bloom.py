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

Memory bounds, stated: the build moves P partial bitmaps (P·m/8
bytes) through one shuffle and collects ONE bitmap to the driver; the
probe ships the bitmap to executors inside the UDF closure (fine to
tens of MiB; a multi-GiB bloom would switch to
``SparkContext.broadcast``, same semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


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


def might_contain(df: DataFrame, hash_col: str, bitmap: bytes, k: int) -> DataFrame:
    """Filter to rows whose hash MIGHT be in the bloom (map-side; no
    shuffle).  Guaranteed to keep every true member.  A NULL hash is
    treated as not-contained (dropped) — the build side never inserts
    NULL, and an unmasked NULL turns into NaN under ``to_numpy()``
    whose int64 view would kill the task (ADVICE r5).  Nulls are
    filtered JVM-side BEFORE the probe, not just masked in the UDF:
    Arrow transfers int64-with-nulls as float64, which corrupts hash
    values beyond 2^53 for the whole batch — the pre-filter keeps the
    transfer int64-exact."""
    m_bits = len(bitmap) * 8
    bm = np.frombuffer(bitmap, dtype=np.uint8)

    @F.pandas_udf(BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        if h.empty:
            return pd.Series([], dtype=bool)
        valid = h.notna()
        if not valid.all():
            # Unexpected: the JVM-side isNotNull pre-filter should
            # keep nulls out of the probe, and a batch WITH nulls
            # arrives as float64 over Arrow — lossy past 2^53, so
            # probe positions could no longer match the build side.
            # Stay contract-safe (no false negatives, ever): pass all
            # non-null rows through unscreened; downstream verify
            # joins drop the extra candidates.
            return pd.Series(valid.to_numpy())
        pos = _positions(h.to_numpy(), m_bits, k)
        hit = (bm[pos >> 3] & (1 << (pos & 7))) != 0
        return pd.Series(hit.all(axis=0))

    return df.where(F.col(hash_col).isNotNull()).where(probe(F.col(hash_col)))
