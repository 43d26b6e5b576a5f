"""ClickHouse external-dictionary analog (dictGet / dictHas).

ClickHouse dictionaries are in-memory key→attribute lookup tables
fed from a dimension source; ``dictGet('d', 'attr', key)`` is a
per-row lookup.  The Spark-idiomatic mapping:

- ``register_dict`` registers the dimension as a temp view with a
  canonical ``key`` column (dictionaries are keyed tables by
  definition).
- DataFrame path: ``dict_get`` is a broadcast left join — dims are
  small, the fact side never shuffles.
- SQL path: ``sql_compat`` rewrites ``dictGet('d','attr',k)`` to a
  correlated scalar subquery, which Catalyst decorrelates into the
  same broadcast-able left join — per-row lookup semantics without a
  row-at-a-time UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_dict(
    spark: SparkSession, name: str, source: DataFrame, key_col: str
) -> None:
    """Register ``source`` as dictionary ``name`` keyed by
    ``key_col`` (exposed canonically as column ``key``)."""
    source.withColumnRenamed(key_col, "key").createOrReplaceTempView(name)


def dict_get(
    df: DataFrame,
    dictionary: DataFrame,
    key_expr,
    attr: str,
    out_col: str | None = None,
    key_col: str = "key",
    default=None,
) -> DataFrame:
    """Append attribute ``attr`` looked up from ``dictionary`` by
    ``key_expr`` — a broadcast left join (the dict side is small by
    definition, so the fact side never exchanges).  ``default`` fills
    missing keys (ClickHouse dictGetOrDefault)."""
    out_col = out_col or attr
    d = F.broadcast(
        dictionary.select(F.col(key_col).alias("__dk"), F.col(attr).alias(out_col))
    )
    joined = df.join(d, key_expr == F.col("__dk"), "left").drop("__dk")
    if default is not None:
        joined = joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(default)))
    return joined
