"""Round-12b: the ClickHouse-SQL dialect surface under DRIVER
correctness.

Every sql_compat capability was pytest-pinned only — no registered
query actually executed a ClickHouse-dialect STATEMENT end to end
(translate → spark.sql → result), so a shim regression could not turn
a driver row red.  These queries run literal ClickHouse SQL through
``sql_compat.run`` against the registered ``events`` view and carry
independent DuckDB oracles: the round-12 shim additions (windowFunnel
strict modes, sequenceCount, sequenceNextNode, retention, topK) each
get one driver-checked statement.

Tie posture: per-user timestamps are unique at every testdata SF
(verified), so the shim's (t, step) entry order and the operators'
(ts, event_id) order coincide and the oracles are order-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhub_spark.plans.queries_core import load
from clickhub_spark.plans.registry import query
from clickhub_spark.sql_compat import run

#: windowFunnel window bound shared with q_funnel_strict_window (r9)
_W = 86_400


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")


@query(
    "q_ch_sql_funnel_strict",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               substr(event_type, 1, 1) AS i,
               epoch(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id IS NOT NULL
    ), b AS (
        SELECT *,
               MIN(CASE WHEN i = 'v' THEN rn END)
                   OVER (PARTITION BY user_id) AS first1
        FROM e
    ), q AS (
        SELECT user_id, i, t, rn, first1,
               (first1 IS NOT NULL AND rn >= first1) AS valid
        FROM b
    ), s0 AS (
        SELECT *,
               MAX(CASE WHEN valid AND i = 'v' THEN t END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a0
        FROM q
    ), s1 AS (
        SELECT *,
               (valid AND i = 'c' AND a0 IS NOT NULL
                AND t <= a0 + {_W}) AS qual2
        FROM s0
    ), s2 AS (
        SELECT *,
               MAX(CASE WHEN qual2 THEN a0 END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a1
        FROM s1
    ), s3 AS (
        SELECT *,
               CASE WHEN valid AND i = 'p' AND a1 IS NOT NULL
                         AND t <= a1 + {_W} THEN 3
                    WHEN qual2 THEN 2
                    WHEN valid AND i = 'v' THEN 1
                    ELSE 0 END AS l,
               (rn > first1 AND (i NOT IN ('v','c','p')
                                 OR (i = 'c' AND a0 IS NULL)
                                 OR (i = 'p' AND a1 IS NULL))) AS brk_m
        FROM s2
    ), s4 AS (
        SELECT *,
               MIN(CASE WHEN brk_m THEN rn END)
                   OVER (PARTITION BY user_id) AS brk
        FROM s3
    ), u AS (
        SELECT user_id,
               COALESCE(MAX(CASE WHEN brk IS NULL OR rn < brk
                                 THEN l END), 0) AS level
        FROM s4 GROUP BY user_id
    )
    SELECT CAST(level AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY level
    """,
)
def q_ch_sql_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(86400, 'strict_order')`` as a LITERAL
    ClickHouse-dialect statement through sql_compat (the round-12
    all-modes fold), grouped to level counts.  Same steps, window and
    oracle as q_funnel_strict_window (r9), whose DataFrame operator
    carries the engine-scan differential — a shim-fold semantics
    regression flips THIS row red while that one stays green."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        f"""
        SELECT CAST(level AS INT) AS level, count() AS n_users FROM (
            SELECT user_id,
                   windowFunnel({_W}, 'strict_order')(
                       ts,
                       substring(event_type, 1, 1) = 'v',
                       substring(event_type, 1, 1) = 'c',
                       substring(event_type, 1, 1) = 'p') AS level
            FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        ) GROUP BY level
        """,
    )


@query(
    "q_ch_sql_seq_count",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                + CASE WHEN event_type = 'click' OR value < 40
                       THEN 2 ELSE 0 END
                + CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END)
                   AS b
        FROM events WHERE user_id IS NOT NULL
    ), s AS (
        SELECT user_id,
               string_agg(substr('ABCDEFG', b, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM e WHERE b > 0 GROUP BY user_id
    )
    SELECT u.user_id,
           CAST(COALESCE(len(regexp_extract_all(seq, '[BCFG][DEFG]')),
                         0) AS INT) AS n_matches
    FROM (SELECT DISTINCT user_id FROM events
          WHERE user_id IS NOT NULL) u
    LEFT JOIN s USING (user_id)
    """,
)
def q_ch_sql_seq_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceCount('(?2)(?3)')`` over overlapping conditions as a
    literal dialect statement — the same adjacency count
    q_seq_count_adjacent (r11) pins via the operator, here through
    the shim's bitset-string render.  The SQL GROUP BY emits a 0 row
    for entry-less users (the operator's groupBy drops them), so the
    oracle left-joins the full user set."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT user_id,
               sequenceCount('(?2)(?3)')(
                   ts, event_type = 'view',
                   event_type = 'click' OR value < 40,
                   event_type = 'purchase') AS n_matches
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        """,
    )


@query(
    "q_ch_sql_next_node",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER w AS next_type,
               row_number() OVER w AS rn
        FROM events WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), v AS (
        SELECT user_id, next_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY rn) AS mr
        FROM o WHERE event_type = 'view'
    )
    SELECT u.user_id, v.next_type AS next_node
    FROM (SELECT DISTINCT user_id FROM events
          WHERE user_id IS NOT NULL) u
    LEFT JOIN v ON v.user_id = u.user_id AND v.mr = 1
    """,
)
def q_ch_sql_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceNextNode('forward', 'first_match')`` as a literal
    dialect statement (the round-12 sorted-entry-array render): the
    event after each user's first view, NULL when the user has no
    view or the view closes the stream — every user emitted (the
    r7 operator query emits only users WITH a view; the oracle here
    left-joins the full user set)."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT user_id,
               sequenceNextNode('forward', 'first_match')(
                   ts, event_type,
                   event_type = 'view', event_type = 'view') AS next_node
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        """,
    )


@query(
    "q_ch_sql_retention",
    oracle="""
    WITH f AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS m1,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS m2,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS m3
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT CAST(SUM(m1) AS BIGINT) AS r1,
           CAST(SUM(m1 * m2) AS BIGINT) AS r2,
           CAST(SUM(m1 * m3) AS BIGINT) AS r3
    FROM f
    """,
)
def q_ch_sql_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``retention(view, click, purchase)`` as a literal dialect
    statement, consumed the canonical way (SUM of element_at over
    users — the cohort funnel report).  r[i] = cond1 AND cond_i each
    held on some event of the user."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT SUM(element_at(r, 1)) AS r1,
               SUM(element_at(r, 2)) AS r2,
               SUM(element_at(r, 3)) AS r3
        FROM (
            SELECT user_id,
                   retention(event_type = 'view',
                             event_type = 'click',
                             event_type = 'purchase') AS r
            FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        )
        """,
    )


@query(
    "q_ch_sql_topk",
    oracle="""
    WITH c AS (
        SELECT event_type, COUNT(*) AS n
        FROM events WHERE event_type IS NOT NULL
        GROUP BY event_type
        ORDER BY n DESC, event_type
        LIMIT 3
    )
    SELECT string_agg(event_type, ',' ORDER BY n DESC, event_type)
               AS top3
    FROM c
    """,
)
def q_ch_sql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``topK(3)(event_type)`` as a literal dialect statement, wired
    as a CSV scalar (the driver canon rejects array cells).  The shim
    pins count-DESC, value-ASC tie order; the oracle recomputes the
    top 3 independently from a plain GROUP BY."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT concat_ws(',', topK(3)(event_type)) AS top3
        FROM events WHERE event_type IS NOT NULL
        """,
    )
