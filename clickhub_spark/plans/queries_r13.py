"""Round-13 registered queries — probe battery 6 under the driver's
value hash: COMPOSITIONS of dialect constructs (VERDICT r12 item 3).

Batteries 1-5 probed expressions mostly in isolation; the round-12
semantics bugs (any(), dateDiff, division) were exactly the kind
isolation finds late.  These statements stack the constructs the
round-13 probe session found real bugs in — QUALIFY + LIMIT BY in one
statement (the LIMIT BY regex used to latch onto the ORDER BY inside
the rewritten OVER clause), PREWHERE merged under a trailing QUALIFY
(the clause scan used to swallow it), SELECT aliases inside QUALIFY
windows (inlined like ClickHouse's alias substitution; Spark rejects
lateral aliases in windows), and the -If combinators' EMPTY-SET type
defaults (ClickHouse sumIf → 0 where Spark/DuckDB sum gives NULL).

Reference: ClickHouse SELECT clause pipeline (PREWHERE → WHERE →
GROUP BY → HAVING → window → QUALIFY → ORDER BY → LIMIT BY → LIMIT);
the unit pins live in tests/test_sql_compat.py::test_probe_battery6_*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhub_spark.plans.queries_core import load
from clickhub_spark.plans.registry import query
from clickhub_spark.sql_compat import run


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")


@query(
    "q_ch_sql_battery6",
    oracle="""
    WITH q AS (
        SELECT user_id, event_id, ROUND(value * 2, 4) + 0.0 AS v2
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ROUND(value * 2, 4) + 0.0 DESC,
                                            event_id) <= 3
    )
    SELECT user_id, event_id, v2 FROM q
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY v2 DESC, event_id) <= 2
    ORDER BY user_id, v2 DESC, event_id
    """,
)
def q_ch_sql_battery6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREWHERE + WHERE + alias-referencing QUALIFY + LIMIT BY stacked
    in ONE literal ClickHouse statement: per user, QUALIFY keeps the
    top-3 events by the ALIASED projection v2 (the shim inlines the
    alias into the window, ClickHouse-style), then LIMIT 2 BY cuts to
    2 per user in statement order.  The oracle composes DuckDB's
    NATIVE QUALIFY twice — fully independent of the shim's
    row_number subquery construction."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT user_id, event_id, round(value * 2, 4) + 0.0 AS v2
        FROM events
        PREWHERE user_id IS NOT NULL
        WHERE value IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY v2 DESC, event_id) <= 3
        ORDER BY user_id, v2 DESC, event_id
        LIMIT 2 BY user_id
        """,
    )


@query(
    "q_ch_sql_battery6b",
    oracle="""
    SELECT user_id,
           ROUND(COALESCE(SUM(CASE WHEN value > 250 THEN value END), 0), 4)
               + 0.0 AS hi_sum,
           CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS hi_n,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
    GROUP BY user_id
    QUALIFY rank() OVER (ORDER BY COUNT(*) DESC, user_id) <= 40
    ORDER BY user_id
    """,
)
def q_ch_sql_battery6b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-set -If defaults under the driver hash: sumIf over a
    condition many groups fail must return ClickHouse's 0, not NULL
    (the oracle spells out COALESCE(..., 0) — DuckDB's FILTERed SUM
    is NULL on empty, so a wrong render cannot silently agree), plus
    countIf and a QUALIFY over the aggregate projection alias n."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT user_id,
               round(sumIf(value, value > 250), 4) + 0.0 AS hi_sum,
               countIf(value > 250) AS hi_n,
               count() AS n
        FROM events
        PREWHERE user_id IS NOT NULL
        WHERE value IS NOT NULL
        GROUP BY user_id
        QUALIFY rank() OVER (ORDER BY n DESC, user_id) <= 40
        ORDER BY user_id
        """,
    )


@query(
    "q_ch_sql_battery6c",
    oracle="""
    SELECT user_id,
           ROUND(SUM(value) / 2, 4) + 0.0 AS half_total,
           CAST(COUNT(CASE WHEN value > (SELECT AVG(value) FROM events)
                           THEN 1 END) AS BIGINT) AS above
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_ch_sql_battery6c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's expression-WITH under the driver hash: one WITH
    list binding a literal (k), a scalar subquery (vbar — the
    corpus-wide mean), and a column expression (sum(value) AS total),
    each substituted at its use sites per CH's alias model; the
    oracle spells the substitutions out longhand in ANSI SQL."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        WITH 2 AS k,
             (SELECT avg(value) FROM events) AS vbar,
             sum(value) AS total
        SELECT user_id,
               round(total / k, 4) + 0.0 AS half_total,
               countIf(value > vbar) AS above
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id
        ORDER BY user_id
        """,
    )


@query(
    "q_ch_ddl_mutate",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(100  AS BIGINT), 'cold'),
        (CAST(2 AS BIGINT), CAST(2000 AS BIGINT), 'hot'),
        (CAST(3 AS BIGINT), CAST(300  AS BIGINT), 'cold'),
        (CAST(5 AS BIGINT), CAST(500  AS BIGINT), 'cold')
    ) AS t(k, v, status)
    """,
)
def q_ch_ddl_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse mutations under driver correctness: a scratch
    warehouse runs literal ``ALTER TABLE … UPDATE/DELETE … WHERE``
    statements (the dialect's modulo() in the predicate goes through
    the shim), plus the reference importer's KeeperMap claim flow
    (repo/importer.py:146-175) — the optimistic UPDATE, the losing
    claimant's 0-rows-matched UPDATE, the verify-read SELECT, and the
    release DELETE — asserted inline so any regression turns this
    driver row red.  Content is fixed (sf-independent); the oracle is
    the hand-computed post-mutation table."""
    import os
    import shutil
    import tempfile

    from clickhub_spark.ddl import Warehouse

    root = tempfile.gettempdir() + f"/chwh_ddl_mutate_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(root)
    wh.execute(
        "CREATE TABLE default.metrics (`k` Int64, `v` Int64, "
        "`status` String) ENGINE = MergeTree ORDER BY (k)"
    )
    wh.execute(
        "INSERT INTO default.metrics (k, v, status) VALUES "
        + ", ".join(f"({k}, {k * 100}, 'cold')" for k in range(1, 7)),
        spark=spark,
    )
    wh.execute(
        "ALTER TABLE default.metrics UPDATE v = v * 10, status = 'hot' "
        "WHERE modulo(k, 2) = 0",
        spark=spark,
    )
    wh.execute(
        "ALTER TABLE default.metrics DELETE WHERE v >= 4000", spark=spark
    )
    # the importer's literal coordination statements (KeeperMap)
    wh.execute(
        "CREATE TABLE default.tasks (`repo_name` String, `priority` "
        "Int64, `scheduled` Float64, `started_time` Float64, "
        "`worker_id` String) ENGINE = KeeperMap('tasks') "
        "PRIMARY KEY repo_name"
    )
    wh.execute(
        "INSERT INTO default.tasks (repo_name, priority) "
        "VALUES ('org/alpha', 1)"
    )
    won = wh.execute(
        "ALTER TABLE default.tasks UPDATE worker_id = 'w1', "
        "started_time = '0' WHERE repo_name = 'org/alpha' "
        "AND worker_id = ''",
        spark=spark,
    )
    lost = wh.execute(
        "ALTER TABLE default.tasks UPDATE worker_id = 'w2', "
        "started_time = '0' WHERE repo_name = 'org/alpha' "
        "AND worker_id = ''",
        spark=spark,
    )
    wh.register_views(spark)
    owner = run(
        spark,
        "SELECT worker_id FROM default_tasks WHERE repo_name = 'org/alpha'",
    ).first()["worker_id"]
    if (won, lost, owner) != ("claimed 1", "claimed 0", "w1"):
        raise AssertionError(
            f"KeeperMap claim flow broke: {(won, lost, owner)!r}"
        )
    wh.execute(
        "ALTER TABLE default.tasks DELETE WHERE repo_name = 'org/alpha'",
        spark=spark,
    )
    return run(
        spark,
        "SELECT k, v, status FROM default_metrics ORDER BY k",
    )
