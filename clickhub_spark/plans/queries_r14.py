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
    "q_ch_sql_battery8",
    oracle="""
    SELECT event_type AS etype,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) + 0.0 AS sv
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY GROUPING SETS ((event_type), ())
    """,
)
def q_ch_sql_battery8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe battery 8: ``GROUP BY ALL WITH TOTALS`` — the composition
    that exposed a real r14 shim bug (the TOTALS rewrite emitted
    ``GROUPING SETS ((ALL), ())``; ALL now expands to the
    non-aggregate select items first).  The totals row carries a NULL
    key on both sides (the WHERE filters genuine NULLs, so no
    collision).  The oracle spells the grouping AND the sets out
    longhand — independent of both the ALL expansion and the TOTALS
    rewrite."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT event_type AS etype,
               count() AS n,
               round(sum(value), 4) + 0.0 AS sv
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY ALL WITH TOTALS
        """,
    )


@query(
    "q_ch_ddl_partition",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), '202401', CAST(10   AS BIGINT)),
        (CAST(2 AS BIGINT), '202401', CAST(20   AS BIGINT)),
        (CAST(4 AS BIGINT), '202402', CAST(1040 AS BIGINT))
    ) AS t(k, part, v)
    """,
)
def q_ch_ddl_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped mutations under driver correctness: a scratch
    warehouse with ``PARTITION BY toYYYYMM(time)`` runs the literal
    ``ALTER TABLE … UPDATE … IN PARTITION v WHERE p``, ``… DELETE IN
    PARTITION v WHERE p`` and ``… DROP PARTITION v`` statements — each
    routed to the partition-PRUNED rewrite (only the named
    ``_partition_id`` directory is read/swapped; flat-time-certified
    at 10M rows by tools/smoke_mutation_pruned.py, the 100 TB
    mutation shape).  Content is fixed (sf-independent); the oracle
    is the hand-computed post-mutation table."""
    import os
    import shutil
    import tempfile

    from clickhub_spark.ddl import Warehouse

    root = tempfile.gettempdir() + f"/chwh_ddl_partition_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(root)
    wh.execute(
        "CREATE TABLE default.pf (`k` Int64, `time` DateTime, `v` Int64) "
        "ENGINE = MergeTree PARTITION BY toYYYYMM(time) ORDER BY (k)"
    )
    wh.execute(
        "INSERT INTO default.pf (k, time, v) VALUES "
        "(1, '2024-01-05 00:00:00', 10), (2, '2024-01-20 00:00:00', 20), "
        "(3, '2024-02-01 00:00:00', 30), (4, '2024-02-09 00:00:00', 40), "
        "(5, '2024-03-01 00:00:00', 50), (6, '2024-03-02 00:00:00', 60)",
        spark=spark,
    )
    out1 = wh.execute(
        "ALTER TABLE default.pf UPDATE v = v + 1000 IN PARTITION "
        "'202402' WHERE k >= 4",
        spark=spark,
    )
    out2 = wh.execute(
        "ALTER TABLE default.pf DELETE IN PARTITION 202402 WHERE k = 3",
        spark=spark,
    )
    out3 = wh.execute("ALTER TABLE default.pf DROP PARTITION '202403'")
    if not (
        out1.startswith("mutated partition 202402")
        and out2.startswith("mutated partition 202402")
        and out3 == "dropped partition 202403"
    ):
        raise AssertionError(
            f"partition statement path broke: {(out1, out2, out3)!r}"
        )
    wh.register_views(spark)
    return run(
        spark,
        "SELECT k, _partition_id AS part, v FROM default_pf ORDER BY k",
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
