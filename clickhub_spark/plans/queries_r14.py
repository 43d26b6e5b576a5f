"""Round-14 registered queries — probe battery 7 under the driver's
value hash: GROUP BY modifiers and the remaining SELECT-clause surface
(VERDICT r13 item 2).

Probed this round against a live Spark 4 session:

- ``GROUP BY a, b WITH ROLLUP`` / ``WITH CUBE`` — NATIVE in Spark SQL
  (same grouping-sets expansion as ClickHouse); the shim passes them
  through untouched and the battery pins that no rewrite pass corrupts
  the modifier spelling (the function forms ROLLUP()/CUBE() were
  already covered by q_agg_rollup/q_agg_cube).
- ``GROUP BY ALL`` — NATIVE in Spark 3.4+ (groups by every
  non-aggregate SELECT expression, ClickHouse 23.4's semantics).
- named ``WINDOW w AS (…)`` clause — NATIVE in Spark.
- ``DISTINCT ON (cols)`` — NOT in Spark: rewritten to a row_number()
  window keeping rank 1 (sql_compat._rewrite_distinct_on); the oracle
  runs DuckDB's NATIVE Postgres-style DISTINCT ON against it.
- ``LIMIT n OFFSET m BY col`` / ``LIMIT m, n BY col`` — NOT in Spark:
  the LIMIT BY window rewrite extended with the per-group offset
  (filter ``m < rn <= m + n``).

Reference: ClickHouse SELECT syntax — DISTINCT ON, LIMIT BY's offset
forms, GROUP BY ALL/WITH ROLLUP/WITH CUBE, WINDOW clause (all dialect
surface a reference user hits weekly).  Unit pins live in
tests/test_sql_compat.py::test_probe_battery7_*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhub_spark.plans.queries_core import load
from clickhub_spark.plans.registry import query
from clickhub_spark.sql_compat import run


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")


@query(
    "q_ch_sql_battery7",
    oracle="""
    SELECT event_type,
           CASE WHEN value > 250 THEN 'hi' ELSE 'lo' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) + 0.0 AS sv
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY ROLLUP (event_type,
                     CASE WHEN value > 250 THEN 'hi' ELSE 'lo' END)
    """,
)
def q_ch_sql_battery7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY … WITH ROLLUP`` — the MODIFIER spelling (ClickHouse
    and MySQL both use it; the ROLLUP() function form is a separate,
    already-oracled query).  Spark supports the modifier natively;
    this row pins that the ~200 shim passes leave it intact AND that
    the grouping-sets expansion (subtotal rows with NULL keys, the
    grand-total row) matches DuckDB's independent ROLLUP() spelling
    value-for-value under the driver hash."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT event_type,
               if(value > 250, 'hi', 'lo') AS band,
               count() AS n,
               round(sum(value), 4) + 0.0 AS sv
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, if(value > 250, 'hi', 'lo') WITH ROLLUP
        """,
    )


@query(
    "q_ch_sql_battery7b",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) + 0.0 AS sv,
           CAST(rank() OVER w AS BIGINT) AS r,
           ROUND(SUM(SUM(value)) OVER w, 4) + 0.0 AS running_sv
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY event_type
    WINDOW w AS (ORDER BY SUM(value) DESC, event_type)
    """,
)
def q_ch_sql_battery7b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + a named ``WINDOW w AS (…)`` clause shared by
    two window functions OVER the aggregate output — both native in
    Spark, both ClickHouse dialect surface.  The oracle spells the
    grouping out longhand (GROUP BY event_type) so a wrong ALL
    expansion cannot silently agree, and reuses the named window in
    DuckDB (which also supports the clause)."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT event_type,
               count() AS n,
               round(sum(value), 4) + 0.0 AS sv,
               rank() OVER w AS r,
               round(sum(sum(value)) OVER w, 4) + 0.0 AS running_sv
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY ALL
        WINDOW w AS (ORDER BY sum(value) DESC, event_type)
        """,
    )


@query(
    "q_ch_sql_battery7c",
    oracle="""
    SELECT DISTINCT ON (event_type) event_type, user_id, event_id, value
    FROM (
        SELECT user_id, event_id, event_type, value
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
              AND event_type IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id)
                BETWEEN 2 AND 3
    )
    ORDER BY event_type, value DESC, event_id
    """,
)
def q_ch_sql_battery7c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DISTINCT ON`` composed over a subquery ``LIMIT n OFFSET m BY``
    — per user drop the single top event by value and keep the next
    two (the offset form of LIMIT BY), then keep ONE row per
    event_type: the highest-value survivor (DISTINCT ON with the
    statement ORDER BY choosing the winner, Postgres/DuckDB
    semantics).  The oracle uses DuckDB's NATIVE DISTINCT ON over a
    row_number transcription of the inner per-group cut — independent
    of both shim rewrites."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT DISTINCT ON (event_type) event_type, user_id, event_id,
               value
        FROM (
            SELECT user_id, event_id, event_type, value
            FROM events
            WHERE user_id IS NOT NULL AND value IS NOT NULL
                  AND event_type IS NOT NULL
            ORDER BY value DESC, event_id
            LIMIT 2 OFFSET 1 BY user_id
        )
        ORDER BY event_type, value DESC, event_id
        """,
    )
