"""Skew mitigation helpers (SURVEY §7 M9; 100 TB posture).

AQE's skew-join splitting handles joins automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py), but two
cases need explicit salting:

- **Skewed aggregation**: measured reality first — for algebraic
  aggregates (sum/count/min/max) Spark's map-side partial aggregation
  already collapses a hot key to one row per map task, and
  countDistinct plans its own two-phase expansion; salting buys
  nothing there (verified at 6M rows, 50% on one key: naive ==
  salted).  ``salted_agg`` exists for what the planner can't spread:
  holistic custom UDAFs and pipelines that must pre-partition by the
  hot key (e.g. a window function downstream).

- **Skewed window/broadcast-miss joins**: ``explode_small_side``
  replicates the small side N times with a salt column so the big
  side's salted key joins co-located.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the
    partials per keys.  Example (count + sum):

        salted_agg(ev, ["user_id"],
                   [F.count("*").alias("n"), F.sum("value").alias("v")],
                   [F.sum("n").alias("n"), F.sum("v").alias("v")])
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def explode_small_side(
    small: DataFrame, salt_buckets: int = 16, salt_col: str = "__salt"
) -> DataFrame:
    """Replicate the small side once per salt bucket; join it on
    (key, salt) against a big side salted with rand()%buckets."""
    return small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Full salted-join composition for extreme key skew: the big side
    gets a random salt, the small side is replicated once per bucket,
    and the join key becomes (key, salt) — a hot key's rows spread
    over ``salt_buckets`` reducers instead of one.

    Use when AQE's skew split can't apply: the join output must stay
    partitioned for a downstream window/aggregate on the same key, or
    the skewed side is mid-pipeline (AQE splits only leaf shuffle
    stats).  Cost: small side ×``salt_buckets`` — keep the small side
    genuinely small or bucket counts modest.  Inner/left joins only
    (the replicated small side makes right/full multiplicities wrong).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    big_s = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_s = explode_small_side(small, salt_buckets)
    # Pin the join strategy to SHUFFLE_HASH (r16, guide §3.1): salting
    # only does anything for a SHUFFLE join — it spreads one hot key's
    # rows over salt_buckets reducers.  Left to itself Catalyst sees
    # the ×buckets-replicated small side as broadcastable and builds a
    # buckets×|small| hash relation on the DRIVER (measured 3.3× the
    # whole query: 3.06 s vs 0.93 s at sf0.1), a plan in which the
    # salt is pure overhead (a broadcast join never shuffles the big
    # side, so there is no skew to fix).  The hint keeps the exact
    # plan shape this operator exists to produce at 100 TB — big side
    # hashed by (key, salt), per-partition hash build of the small
    # side — and SHJ's build memory is |small|×buckets/partitions,
    # bounded by construction because the small side is small.
    return big_s.join(small_s.hint("shuffle_hash"), [*on, "__salt"], how).drop("__salt")
