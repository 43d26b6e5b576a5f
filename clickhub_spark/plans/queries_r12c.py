"""Round-12c: probe-battery-4 dialect surface under DRIVER correctness.

Battery 4 closed ~50 more ClickHouse-dialect holes in sql_compat
(PREWHERE+WHERE conjunction, SAMPLE → TABLESAMPLE, the any()/anyLast()
first-value aggregates, -If/-Distinct/-Array combinators, the lookup
transform(), 1-based arrayElement, gcd/lcm, splitByString, …).  All
of them are pytest-pinned (tests/test_sql_compat.py battery-4 blocks);
these queries put the representative, DETERMINISTIC subset under the
driver's value-hash compare by running literal ClickHouse statements
end to end (sql_compat.run → translate → spark.sql) with independent
DuckDB oracles.

Reference anchors: ClickHouse SELECT clause order incl. PREWHERE and
WITH TOTALS (the engine the reference's repo/importer.py drives);
the reference's own statements use the plain subset (README.md:265),
so this widening is engine parity beyond the app's needs.

Float posture: every derived double is ROUNDed on both sides (driver
canon convention, registry docstring).  The WITH TOTALS totals row
carries NULL group keys on both engines (GROUPING SETS rendering).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from clickhub_spark.plans.queries_core import load
from clickhub_spark.plans.registry import query
from clickhub_spark.sql_compat import run


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")


@query(
    "q_ch_sql_totals",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) + 0.0 AS sv,
           CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS big,
           ROUND(quantile_cont(value, 0.5), 4) + 0.0 AS med
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY GROUPING SETS ((event_type), ())
    """,
)
def q_ch_sql_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY … WITH TOTALS`` as a literal dialect statement: the
    shim renders the totals row as the empty grouping set (NULL group
    keys — ClickHouse shows the type default in flat formats, but the
    row SET is identical).  countIf and medianExact ride along so the
    battery's -If and exact-quantile renders face the value-hash.
    One exchange: GROUPING SETS shares the shuffle across both sets."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT event_type,
               count() AS n,
               round(sum(value), 4) + 0.0 AS sv,
               countIf(value > 50) AS big,
               round(medianExact(value), 4) + 0.0 AS med
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type WITH TOTALS
        """,
    )


@query(
    "q_ch_sql_prewhere",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) + 0.0 AS sv
    FROM events
    WHERE (value > 5)
      AND (event_type IN ('view', 'click') OR value > 90)
    GROUP BY event_type
    """,
)
def q_ch_sql_prewhere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PREWHERE p1 WHERE p2`` — ClickHouse applies the CONJUNCTION
    (PREWHERE is only a scan-order hint); the shim merges the clauses
    with both sides parenthesized so the OR in the WHERE keeps its
    binding.  Catalyst pushes the merged predicate into the parquet
    scan — the hint's purpose is native to the planner here."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT event_type, count() AS n, round(sum(value), 4) + 0.0 AS sv
        FROM events
        PREWHERE value > 5
        WHERE event_type IN ('view', 'click') OR value > 90
        GROUP BY event_type
        """,
    )


@query(
    "q_ch_sql_battery4",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'view' THEN 'V'
                WHEN event_type = 'click' THEN 'C'
                ELSE '?' END AS et_code,
           str_split(event_type, 'e')[1] AS et_head,
           CAST(gcd(event_id, 24) AS BIGINT) AS g,
           CAST(event_id & 1 AS INT) AS low_bit,
           CAST((event_id >> 24) & 255 AS VARCHAR) || '.' ||
           CAST((event_id >> 16) & 255 AS VARCHAR) || '.' ||
           CAST((event_id >> 8) & 255 AS VARCHAR) || '.' ||
           CAST(event_id & 255 AS VARCHAR) AS ip,
           CAST(date_trunc('week', ts) AS DATE) AS monday,
           CAST(CASE WHEN user_id % 5 = 0 THEN 0
                     ELSE event_id % (user_id % 5) END AS BIGINT) AS mz,
           ROUND((value + 1.0) / (abs(value) + 2.0), 4) + 0.0 AS dv
    FROM events
    WHERE event_id < 500
    """,
)
def q_ch_sql_battery4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A literal dialect statement sweeping the battery-4 scalar
    renders that are deterministic and DuckDB-expressible: lookup
    transform(), splitByString + 1-based arrayElement, gcd (the
    92-step Euclid fold), bitTest, IPv4NumToString, toMonday,
    moduloOrZero, and divide()'s always-Float64 division (the IEEE
    zero-divisor branches are pytest-pinned; the driver row keeps a
    strictly positive denominator so both engines hash finite
    values).  All
    expressions stay inside whole-stage codegen (no UDFs); the
    predicate and 4-column read reach the parquet scan."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT event_id,
               transform(event_type, ['view', 'click'], ['V', 'C'], '?')
                   AS et_code,
               arrayElement(splitByString('e', event_type), 1) AS et_head,
               gcd(event_id, 24) AS g,
               bitTest(event_id, 0) AS low_bit,
               IPv4NumToString(event_id) AS ip,
               toMonday(ts) AS monday,
               moduloOrZero(event_id, user_id % 5) AS mz,
               round(divide(value + 1.0, abs(value) + 2.0), 4) + 0.0 AS dv
        FROM events
        WHERE event_id < 500
        """,
    )


@query(
    "q_ch_ddl_ctas",
    oracle="""
    SELECT CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) + 0.0 AS sv
    FROM events WHERE event_type = 'view'
    GROUP BY CAST(ts AS DATE)
    UNION ALL
    SELECT CAST(ts AS DATE) + 1000 AS d,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) + 0.0 AS sv
    FROM events WHERE event_type = 'click'
    GROUP BY CAST(ts AS DATE)
    """,
)
def q_ch_ddl_ctas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse ETL statement surface end to end: CREATE TABLE …
    AS SELECT derives the schema from a dialect aggregate over events
    and writes it sort-clustered; INSERT … SELECT appends a second
    slice (click days shifted +1000 so key sets are disjoint) matching
    columns by position through the shim; RENAME TABLE moves the
    table; the final dialect SELECT reads the renamed view.  Every
    layer is the statement path — a parser, dispatch, or
    insert-alignment regression flips this row red.  The oracle
    recomputes both slices directly from parquet."""
    import shutil
    import tempfile

    from clickhub_spark.ddl import Warehouse

    _events_view(spark, sf_dir)
    # pid-suffixed: concurrent runs (or two users on a shared box)
    # must not rmtree each other's live warehouse (review finding)
    root = tempfile.gettempdir() + f"/chwh_ddl_ctas_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(root)
    wh.execute("CREATE DATABASE IF NOT EXISTS ana")
    wh.execute(
        "CREATE TABLE ana.daily ENGINE = MergeTree() ORDER BY (d) AS "
        "SELECT toDate(ts) AS d, count() AS n, "
        "round(sum(value), 4) + 0.0 AS sv "
        "FROM events WHERE event_type = 'view' GROUP BY toDate(ts)",
        spark=spark,
    )
    wh.execute(
        "INSERT INTO ana.daily "
        "SELECT addDays(toDate(ts), 1000) AS d, count() AS n, "
        "round(sum(value), 4) + 0.0 AS sv "
        "FROM events WHERE event_type = 'click' GROUP BY toDate(ts)",
        spark=spark,
    )
    wh.execute("RENAME TABLE ana.daily TO ana.daily_all")
    wh.register_views(spark)
    return run(spark, "SELECT d, n, sv FROM ana_daily_all")


@query(
    "q_ch_ddl_mv",
    oracle="""
    WITH ev AS (
        SELECT event_type AS et, value AS v, event_id
        FROM events WHERE event_type IS NOT NULL
    ), blocks AS (
        SELECT et, CAST(count(*) AS BIGINT) AS n, ROUND(SUM(v), 4) AS sv
        FROM ev WHERE event_id % 2 = 0 GROUP BY et
        UNION ALL
        SELECT et, CAST(count(*) AS BIGINT) AS n, ROUND(SUM(v), 4) AS sv
        FROM ev WHERE event_id % 2 = 1 GROUP BY et
    )
    SELECT et, CAST(SUM(n) AS BIGINT) AS n,
           ROUND(SUM(sv), 4) + 0.0 AS sv
    FROM blocks GROUP BY et
    """,
)
def q_ch_ddl_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's insert-maintained rollup, every layer a literal
    statement: a MATERIALIZED VIEW ``TO`` a SummingMergeTree target
    fires PER INSERTED BLOCK (the SELECT runs over the block only —
    no global recompute), each block appending one partial-aggregate
    row per key; the SummingMergeTree merges the partials on read.
    Two INSERT … SELECT blocks (even/odd event_id) land two partials
    per key; the oracle reproduces the block-wise rounding exactly.
    At 100 TB this is the pattern that replaces full-table rollup
    jobs: each ingest batch shuffles only itself."""
    import shutil
    import tempfile

    from clickhub_spark.ddl import Warehouse

    _events_view(spark, sf_dir)
    # pid-suffixed: concurrent runs (or two users on a shared box)
    # must not rmtree each other's live warehouse (review finding)
    root = tempfile.gettempdir() + f"/chwh_ddl_mv_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(root)
    wh.execute("CREATE DATABASE IF NOT EXISTS ana")
    wh.execute(
        "CREATE TABLE ana.ev (`et` String, `v` Float64) "
        "ENGINE = MergeTree ORDER BY (et)"
    )
    wh.execute(
        "CREATE TABLE ana.totals (`et` String, `n` Int64, `sv` Float64) "
        "ENGINE = SummingMergeTree ORDER BY (et)"
    )
    wh.execute(
        "CREATE MATERIALIZED VIEW ana.mv TO ana.totals AS "
        "SELECT et, count() AS n, round(sum(v), 4) AS sv "
        "FROM ana.ev GROUP BY et",
        spark=spark,
    )
    for parity in (0, 1):
        wh.execute(
            "INSERT INTO ana.ev SELECT event_type, value FROM events "
            f"WHERE event_id % 2 = {parity} AND event_type IS NOT NULL",
            spark=spark,
        )
    wh.register_views(spark)
    return run(
        spark,
        "SELECT et, n, round(sv, 4) + 0.0 AS sv FROM ana_totals_final",
    )


@query(
    "q_ch_sql_table_fns",
    oracle="""
    SELECT b.range AS bucket,
           CAST(count(l.l_orderkey) AS BIGINT) AS n,
           ROUND(SUM(COALESCE(l.l_extendedprice, 0)), 2) + 0.0 AS rev
    FROM range(0, 8) b
    LEFT JOIN lineitem l
      ON CAST(floor(l.l_quantity / 7) AS BIGINT) = b.range
    GROUP BY b.range
    """,
)
def q_ch_sql_table_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect TABLE FUNCTIONS as a literal statement: ``numbers(8)``
    (the engine's integer generator — rendered as Spark's range()
    table with the `number` column) LEFT JOINed to ``file(path,
    'Parquet')`` (the engine's local-file relation — Spark's
    path-based ``parquet.`…``` table, so the scan gets pushdown and
    pruning like any catalog table).  l_quantity is 1..50 so every
    bucket 0..7 is populated; the oracle uses DuckDB's native range()
    table function against the pre-registered lineitem view (the same
    parquet file() reads)."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        f"""
        SELECT b.number AS bucket,
               count(l.l_orderkey) AS n,
               round(sum(coalesce(l.l_extendedprice, 0)), 2) + 0.0 AS rev
        FROM numbers(8) AS b
        LEFT JOIN file('{sf_dir}/lineitem.parquet', 'Parquet') AS l
          ON toInt64(floor(l.l_quantity / 7)) = b.number
        GROUP BY b.number
        """,
    )


@query(
    "q_ch_sql_battery5",
    oracle="""
    WITH base AS (
        SELECT event_id, ts, value,
               date_trunc('year', ts)::DATE AS jan1
        FROM events WHERE event_id < 400
    ), wk AS (
        SELECT *,
               date_diff('day',
                         jan1 + CAST((7 - dayofweek(jan1)) % 7 AS INTEGER),
                         ts::DATE) AS days_from_fs
        FROM base
    )
    SELECT event_id,
           CAST(CASE WHEN days_from_fs < 0 THEN 0
                     ELSE days_from_fs // 7 + 1 END AS INT) AS wk,
           CAST(CASE WHEN days_from_fs < 0 THEN 202353
                     ELSE year(ts) * 100 + (days_from_fs // 7 + 1)
                END AS INT) AS yw,
           CAST(isodow(ts) AS INT) AS dow,
           CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts)
                AS BIGINT) AS dd,
           CAST(floor(epoch(ts - TIMESTAMP '2024-01-01 00:00:00') / 3600)
                AS BIGINT) AS ah,
           ROUND(1.0 * value + 2.0 * 1.0, 4) + 0.0 AS dp,
           ROUND(least(greatest(value, 10.0), 50.0), 4) + 0.0 AS cl
    FROM wk
    """,
)
def q_ch_sql_battery5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery-5 renders under the driver's value-hash, as one literal
    statement over events: toWeek/toYearWeek mode 0 (Jan 1-6 2024
    precede the year's first Sunday, so the week-0 branch AND the
    year-week rollback to 202353 are exercised on real rows),
    toDayOfWeek (Monday=1 ≡ DuckDB isodow), dateDiff (BOUNDARY
    crossings ≡ DuckDB date_diff) vs age (complete units ≡ epoch
    floor), arrayDotProduct, and clamp.  The oracle reimplements the
    MySQL week-0 definition from first principles (first-Sunday
    datediff), not via the shim's construction."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT event_id,
               toWeek(ts) AS wk,
               toYearWeek(ts) AS yw,
               toDayOfWeek(ts) AS dow,
               dateDiff('day', toDateTime('2024-01-01 00:00:00'), ts) AS dd,
               age('hour', toDateTime('2024-01-01 00:00:00'), ts) AS ah,
               round(arrayDotProduct([1.0, 2.0], [value, 1.0]), 4) + 0.0 AS dp,
               round(clamp(value, 10.0, 50.0), 4) + 0.0 AS cl
        FROM events WHERE event_id < 400
        """,
    )


@query(
    "q_ch_sql_qualify",
    oracle="""
    SELECT user_id, event_id, ROUND(value, 4) + 0.0 AS v
    FROM events WHERE user_id IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id) = 1
    """,
)
def q_ch_sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``QUALIFY`` — the post-window filter — as a literal statement:
    each user's top event by value (event_id the deterministic
    tiebreak).  The shim wraps the query, filters on a helper
    projection column, and drops it; the oracle is DuckDB's NATIVE
    QUALIFY — an independent engine's implementation of the clause,
    not a transcription.  One exchange (the window's hash partition
    by user_id); the filter runs post-window exactly as the clause
    defines."""
    _events_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT user_id, event_id, round(value, 4) + 0.0 AS v
        FROM events WHERE user_id IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) = 1
        """,
    )
