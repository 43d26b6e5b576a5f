"""Query plan builders, grouped by SURVEY.md §2 operator family.

Importing this package registers every query into
``clickhub_spark.plans.registry``.
"""

from clickhub_spark.plans import (  # noqa: F401
    queries_ch,
    queries_core,
    queries_extra,
    queries_fn,
    queries_fn2,
    queries_join,
    queries_llm,
    queries_stream,
    queries_window,
)
from clickhub_spark.plans.registry import all_specs  # noqa: F401
