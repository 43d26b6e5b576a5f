"""Query plan builders, grouped by SURVEY.md §2 operator family.

Importing this package registers every query into
``clickhub_spark.plans.registry``.

Import order IS registration order (the registry dict preserves
insertion order), and external harnesses may verify only a prefix of
the registered queries (50 in rounds 1-2).  ``registry.ROUND_PRIORITY``
additionally front-loads specific names (new/changed queries and ones
that have never had a driver row) ahead of registration order, and
``SPARK_GRAFT_QUERY_ORDER`` overrides ad hoc.  Round 1's window
covered ch/core/extra/fn; round 2's covered join/window/llm/stream/
fn2; round 3 front-loads the priority list then returns to the
round-1 families so every query's driver evidence stays ≤2 rounds
old.
"""

from clickhub_spark.plans import (  # noqa: F401
    queries_core,
    queries_ch,
    queries_extra,
    queries_fn,
    queries_join,
    queries_window,
    queries_llm,
    queries_stream,
    queries_fn2,
    queries_tpch,
    queries_r5,
    queries_r5b,
    queries_r5c,
    queries_r6,
    queries_r7,
    queries_r8,
    queries_r9,
    queries_r10,
    queries_r11,
    queries_r12,
    queries_r12b,
    queries_r12c,
    queries_r13,
    queries_r14,
    queries_r15,
)
from clickhub_spark.plans.registry import all_specs  # noqa: F401
