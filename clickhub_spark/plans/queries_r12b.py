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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
               (rn > first1
                AND (COALESCE(i NOT IN ('v','c','p'), TRUE)
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


@query(
    "q_ch_sql_funnel_multimatch",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, s.step
        FROM events, UNNEST([
            CASE WHEN event_type = 'view' AND value < 8 THEN 0 END,
            CASE WHEN (event_type = 'click' AND value < 12)
                   OR (event_type = 'view' AND value < 4) THEN 1 END,
            CASE WHEN (event_type = 'purchase' AND value < 16)
                   OR value < 2 THEN 2 END
        ]) AS s(step)
        WHERE user_id IS NOT NULL AND s.step IS NOT NULL
    ), o AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id, step) AS rn
        FROM e
    ), s0 AS (
        SELECT *,
               MAX(CASE WHEN step = 0 THEN rn END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a0
        FROM o
    ), s1 AS (
        SELECT *, (step = 1 AND a0 IS NOT NULL) AS q2 FROM s0
    ), s2 AS (
        SELECT *,
               MAX(CASE WHEN q2 THEN rn END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS a1
        FROM s1
    ), lvl AS (
        SELECT user_id,
               CASE WHEN step = 2 AND a1 IS NOT NULL THEN 3
                    WHEN q2 THEN 2
                    WHEN step = 0 THEN 1 ELSE 0 END AS l
        FROM s2
    ), m AS (
        SELECT user_id, MAX(l) AS level FROM lvl GROUP BY user_id
    ), u AS (
        -- the dialect GROUP BY emits users with ZERO step-matching
        -- entries at level 0; CTE e drops them, so join back the
        -- full user set (the entry-less-user gap, review round 12)
        SELECT au.user_id, COALESCE(m.level, 0) AS level
        FROM (SELECT DISTINCT user_id FROM events
              WHERE user_id IS NOT NULL) au
        LEFT JOIN m USING (user_id)
    )
    SELECT CAST(level AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY level
    """,
)
def q_ch_sql_funnel_multimatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel with OVERLAPPING step conditions as a literal
    dialect statement — the exact silent-undercount case ADVICE r11
    flagged in the old one-entry-per-event shim fold, now a DRIVER
    row: a 'view' with value < 2 matches all three steps and must
    climb the whole funnel alone.  Same steps and oracle as
    q_funnel_multimatch (r11, the operator form); the dialect's
    mandatory window is set far beyond the data's time span, so the
    unbounded oracle applies.  Per-user timestamps are unique at
    every SF, so the fold's (t, step) entry order equals the
    operator's (ts, event_id, step)."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT CAST(level AS INT) AS level, count() AS n_users FROM (
            SELECT user_id,
                   windowFunnel(1000000000)(
                       ts,
                       event_type = 'view' AND value < 8,
                       (event_type = 'click' AND value < 12)
                           OR (event_type = 'view' AND value < 4),
                       (event_type = 'purchase' AND value < 16)
                           OR value < 2) AS level
            FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        ) GROUP BY level
        """,
    )


@query(
    "q_ch_sql_seq_events",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               (event_type = 'view') AS c1,
               (event_type = 'click' OR value < 40) AS c2,
               (event_type = 'purchase') AS c3
        FROM events
        WHERE user_id IS NOT NULL
          AND (event_type IN ('view', 'click', 'purchase')
               OR value < 40)
    ), m1 AS (
        SELECT user_id, MIN(rn) AS r1 FROM e WHERE c1 GROUP BY user_id
    ), m2 AS (
        SELECT e.user_id, MIN(rn) AS r2
        FROM e JOIN m1 USING (user_id)
        WHERE c2 AND rn > r1 GROUP BY e.user_id
    ), m3 AS (
        SELECT e.user_id, MIN(rn) AS r3
        FROM e JOIN m2 USING (user_id)
        WHERE c3 AND rn > r2 GROUP BY e.user_id
    ), u AS (SELECT DISTINCT user_id FROM events
             WHERE user_id IS NOT NULL)
    SELECT u.user_id,
           (m3.user_id IS NOT NULL) AS matched,
           ROUND(CASE WHEN m3.user_id IS NOT NULL
                 THEN (SELECT t FROM e WHERE e.user_id = u.user_id
                       AND e.rn = m1.r1) END, 6) AS ts1,
           ROUND(CASE WHEN m3.user_id IS NOT NULL
                 THEN (SELECT t FROM e WHERE e.user_id = u.user_id
                       AND e.rn = m2.r2) END, 6) AS ts2,
           ROUND(CASE WHEN m3.user_id IS NOT NULL
                 THEN (SELECT t FROM e WHERE e.user_id = u.user_id
                       AND e.rn = m3.r3) END, 6) AS ts3
    FROM u
    LEFT JOIN m1 USING (user_id)
    LEFT JOIN m2 USING (user_id)
    LEFT JOIN m3 USING (user_id)
    """,
)
def q_ch_sql_seq_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceMatchEvents('(?1).*(?2).*(?3)')`` as a literal
    dialect statement (the round-12 greedy-trail aggregate fold),
    trail exploded to scalar columns for the driver canon.  The
    oracle is q_seq_match_events' (r11) INDEPENDENT correlated-min
    derivation, extended over the full user set (the dialect GROUP
    BY emits entry-less users with an empty trail)."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT user_id,
               size(trail) = 3 AS matched,
               round(try_element_at(trail, 1), 6) AS ts1,
               round(try_element_at(trail, 2), 6) AS ts2,
               round(try_element_at(trail, 3), 6) AS ts3
        FROM (
            SELECT user_id,
                   sequenceMatchEvents('(?1).*(?2).*(?3)')(
                       ts, event_type = 'view',
                       event_type = 'click' OR value < 40,
                       event_type = 'purchase') AS trail
            FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        )
        """,
    )


@query(
    "q_ch_sql_limit_by",
    oracle="""
    WITH r AS (
        SELECT user_id, event_id, event_type, ts,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT user_id, event_id, event_type, ts
    FROM r WHERE rn <= 2
    """,
)
def q_ch_sql_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY … LIMIT 2 BY event_type`` as a literal
    dialect statement — the first two events of each type in time
    order (globally-unique event_id as the tiebreaker).  The shim
    rewrites LIMIT BY to a row_number window over the statement's
    ORDER BY — which must be projected by the body (the documented
    single-tail scope), so ts rides along in the output.  The oracle
    IS that window, written directly in DuckDB."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT user_id, event_id, event_type, ts
        FROM events WHERE user_id IS NOT NULL
        ORDER BY ts, event_id LIMIT 2 BY event_type
        """,
    )


@query(
    "q_ch_sql_with_fill",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'purchase' AND value > 99
        GROUP BY 1
    ), b AS (
        SELECT min(h) AS lo, max(h) AS hi FROM hourly
    ), spine AS (
        SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
                    AS TIMESTAMP) AS h
        FROM b
    )
    SELECT s.h AS h, COALESCE(d.n, 0) AS n
    FROM spine s LEFT JOIN hourly d USING (h)
    """,
)
def q_ch_sql_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY h WITH FILL STEP INTERVAL 1 HOUR`` as a LITERAL
    ClickHouse-dialect statement (docs: ORDER BY … WITH FILL).  The
    ``value > 99`` slice leaves real hour gaps at every SF (635 / 512
    / 20 missing hours at sf0.001/0.01/0.1), so the inserted zero
    rows are load-bearing in the hash compare.  run() executes the
    inner aggregate and applies operators/fill.py — a one-row min/max
    bound exploded through sequence(), full-outer joined back; the
    oracle builds the identical spine via generate_series."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT toStartOfHour(ts) AS h, count() AS n
        FROM events WHERE event_type = 'purchase' AND value > 99
        GROUP BY h ORDER BY h WITH FILL STEP INTERVAL 1 HOUR
        """,
    )


@query(
    "q_ch_sql_with_fill_range",
    oracle="""
    WITH agg AS (
        SELECT CAST(FLOOR(value / 8) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        FROM events WHERE event_type = 'view' AND value BETWEEN 0 AND 99
        GROUP BY 1
    ), spine AS (
        SELECT UNNEST(generate_series(0, 19)) AS bucket
    )
    SELECT s.bucket AS bucket, COALESCE(a.n, 0) AS n,
           COALESCE(a.users, 0) AS users
    FROM spine s LEFT JOIN agg a USING (bucket)
    """,
)
def q_ch_sql_with_fill_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH FILL FROM 0 TO 20`` (TO exclusive) over a numeric
    bucket key: data tops out at bucket 12 (value <= 99, width 8), so
    buckets 13-19 are inserted with column defaults (0 counts) at
    EVERY scale factor — the FROM/TO extension path is always
    exercised, not only when the data happens to have gaps.  Multiple
    non-fill aggregate columns pin the per-column default fill."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT toInt64(value / 8) AS bucket, count() AS n,
               uniqExact(user_id) AS users
        FROM events WHERE event_type = 'view' AND value BETWEEN 0 AND 99
        GROUP BY bucket ORDER BY bucket WITH FILL FROM 0 TO 20
        """,
    )


@query(
    "q_ch_sql_asof",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), v AS (
        SELECT user_id, ts, value AS seen_value FROM events
        WHERE event_type = 'view' AND user_id IS NOT NULL
    )
    SELECT p.user_id AS user_id, p.event_id AS event_id,
           p.ts AS ts, p.value AS value, v.seen_value AS seen_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_ch_sql_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ASOF LEFT JOIN … USING (user_id, ts)`` as a LITERAL
    ClickHouse-dialect statement: each purchase joined to the user's
    latest prior view.  run() substitutes the fragment with the
    union+window asof operator (operators/asof.py — no candidate-pair
    materialization, ONE shuffle on the key), which is why this is a
    delegation and not a SQL render: the range-join + row_number form
    a pure rewrite would need explodes at 100 TB.  The oracle is
    DuckDB's NATIVE ASOF LEFT JOIN — an independent engine's
    implementation of the same semantics, not a transcription.
    Unmatched rows keep NULL (ClickHouse join_use_nulls = 1)."""
    ev = load(spark, sf_dir, "events")
    ev.where(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("user_id", "event_id", "ts", "value").createOrReplaceTempView(
        "purchases_t"
    )
    ev.where(
        (F.col("event_type") == "view") & F.col("user_id").isNotNull()
    ).select(
        "user_id", "ts", F.col("value").alias("seen_value")
    ).createOrReplaceTempView("views_t")
    return run(
        spark,
        """
        SELECT user_id, event_id, ts, value, seen_value
        FROM purchases_t ASOF LEFT JOIN views_t USING (user_id, ts)
        """,
    )


@query(
    "q_ch_ddl_roundtrip",
    oracle="""
    SELECT * FROM (VALUES
        ('org/alpha', CAST(2 AS BIGINT), CAST(30 AS BIGINT)),
        ('org/beta',  CAST(1 AS BIGINT), CAST(7  AS BIGINT))
    ) AS t(repo_name, n_commits, lines_added)
    """,
)
def q_ch_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DDL/DML front-end (ddl.py) under driver correctness: the
    reference's LITERAL git.commits CREATE TABLE (types.json:7) plus
    INSERT … VALUES statements build a ReplacingMergeTree table in a
    scratch warehouse; the FINAL view then dedups the re-imported
    row and a ClickHouse-dialect SELECT aggregates it.  Every layer
    is the statement path — no DataFrame shortcuts — so a parser or
    engine-dispatch regression flips this row red.  Content is fixed
    (sf-independent); the oracle is the hand-computed result."""
    import shutil
    import tempfile

    from clickhub_spark.ddl import Warehouse

    # pid-suffixed: concurrent runs (or two users on a shared box)
    # must not rmtree each other's live warehouse (review finding)
    root = tempfile.gettempdir() + f"/chwh_ddl_roundtrip_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(root)
    wh.execute("CREATE DATABASE IF NOT EXISTS git")
    # reference types.json:7 — verbatim
    wh.execute(
        "CREATE TABLE git.commits ( `hash` String, `author` "
        "LowCardinality(String), `time` DateTime, `message` String, "
        "`files_added` UInt32, `files_deleted` UInt32, `files_renamed` "
        "UInt32, `files_modified` UInt32, `lines_added` UInt32, "
        "`lines_deleted` UInt32, `hunks_added` UInt32, `hunks_removed` "
        "UInt32, `hunks_changed` UInt32, `repo_name` "
        "LowCardinality(String), `updated_at` DateTime MATERIALIZED "
        "now() ) ENGINE = ReplacingMergeTree ORDER BY (repo_name, time, "
        "hash)"
    )
    ins = (
        "INSERT INTO git.commits (hash, author, time, message, "
        "files_added, files_deleted, files_renamed, files_modified, "
        "lines_added, lines_deleted, hunks_added, hunks_removed, "
        "hunks_changed, repo_name) VALUES "
    )
    wh.execute(
        ins + "('h1', 'alice', '2024-01-01 10:00:00', 'm1', "
        "1, 0, 0, 0, 10, 2, 1, 0, 0, 'org/alpha'), "
        "('h2', 'bob', '2024-01-02 11:00:00', 'm2', "
        "2, 1, 0, 0, 20, 3, 2, 0, 0, 'org/alpha'), "
        "('h3', 'carol', '2024-01-03 12:00:00', 'm3', "
        "1, 0, 0, 0, 7, 1, 1, 0, 0, 'org/beta')",
        spark=spark,
    )
    # idempotent re-import: the same h2 arrives again (identical
    # payload) — base table holds 4 rows, FINAL must keep 3
    wh.execute(
        ins + "('h2', 'bob', '2024-01-02 11:00:00', 'm2', "
        "2, 1, 0, 0, 20, 3, 2, 0, 0, 'org/alpha')",
        spark=spark,
    )
    wh.register_views(spark)
    return run(
        spark,
        "SELECT repo_name, count() AS n_commits, "
        "sum(lines_added) AS lines_added "
        "FROM git_commits_final GROUP BY repo_name",
    )


@query(
    "q_ch_sql_any_join",
    oracle="""
    WITH first_v AS (
        SELECT user_id,
               CAST(MIN(value) AS DOUBLE) AS first_value
        FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
        GROUP BY user_id
    ), p AS (
        SELECT user_id, event_id, value FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
    )
    SELECT p.user_id AS user_id, p.event_id AS event_id,
           p.value AS value, f.first_value AS first_value
    FROM p LEFT JOIN first_v f USING (user_id)
    """,
)
def q_ch_sql_any_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ANY LEFT JOIN`` strictness as a literal dialect statement:
    each purchase joined to AT MOST ONE row of a per-user quote view.
    The rewrite dedupes the right side with a key-partitioned
    row_number subquery BEFORE the join — one extra window over the
    small side, no fanout on the probe side.  The right view is
    unique-per-key BY CONSTRUCTION (min aggregate), so ClickHouse's
    'arbitrary matching row' is pinned and the oracle is a plain
    LEFT JOIN against the same aggregate."""
    ev = load(spark, sf_dir, "events")
    ev.where(
        (F.col("event_type") == "view") & F.col("user_id").isNotNull()
    ).groupBy("user_id").agg(
        F.min("value").cast("double").alias("first_value")
    ).createOrReplaceTempView("first_view_t")
    ev.where(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("user_id", "event_id", "value").createOrReplaceTempView(
        "purchases_any_t"
    )
    return run(
        spark,
        """
        SELECT a.user_id AS user_id, a.event_id AS event_id,
               a.value AS value, b.first_value AS first_value
        FROM purchases_any_t a ANY LEFT JOIN first_view_t b
        ON a.user_id = b.user_id
        """,
    )
