"""Query registry — single source of truth binding each operator's
Spark builder to its DuckDB oracle SQL, so ``queries()`` and
``oracle_sql()`` in ``__spark_entry__.py`` can never drift apart.

Conventions (driver contract, __spark_entry__.py docstring):
- builder signature: ``(spark, sf_dir) -> DataFrame``
- every computed/aggregate column aliased identically on both sides;
- derived floats rounded (2-6 dp) on BOTH sides, because Spark's
  partial aggregation and DuckDB's sequential fold can differ in the
  last ulp;
- DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT,
  Spark keeps LongType);
- top-k queries order by a key-complete sort (unique tiebreaker) so
  both engines select the same row SET.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """All registered QuerySpecs (importing plan modules populates this)."""
    from clickhub_spark import plans  # noqa: F401  (triggers module imports)

    return dict(_REGISTRY)
