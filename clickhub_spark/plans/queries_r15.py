"""Round-15 registered queries — probe battery 9 under the driver's
value hash: the dialect surface the round-14 verdict flagged
(VERDICT r14 items 2-4).

- ``ARRAY JOIN`` beyond the single-aliased form: the multi-array zip
  (ClickHouse unnests POSITIONALLY and errors on length mismatch) and
  the bare no-alias form (the element REPLACES the column in scope —
  CH's most common spelling; reference users explode exactly such
  array columns, create_db.py:88,92 labels/assignees).  DuckDB's
  Postgres-style multi-``unnest`` zip is the independent oracle.
- ``GROUP BY … WITH TOTALS HAVING``: ClickHouse ALWAYS emits the
  totals row (totals_mode = 'before_having' default aggregates ALL
  source rows); the oracle is a hand-built UNION ALL of the filtered
  per-group rows and an unconditional grand-total row — it cannot
  agree with a render that lets HAVING drop the totals row.
- ``SAMPLE k OFFSET m``: deterministic md5 hash-range slice over the
  table's declared sampling key (set_sample_key ≙ SAMPLE BY); the
  oracle spells the identical hex-range predicate, so both engines
  must select the same row SET — closing the last loud SAMPLE
  ValueError in the shim.
- ``untuple()`` / tuple ``.N`` access: tuple() renders to a
  named_struct with ``_N`` fields; untuple expands via the
  inline(array(…)) generator and ``t.2`` reads ``_2``.

Unit pins live in tests/test_sql_compat.py::test_array_join_* /
test_totals_row_survives_having / test_probe_battery9_*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhub_spark.plans.queries_core import load
from clickhub_spark.plans.registry import query
from clickhub_spark.sql_compat import run, set_sample_key


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")


@query(
    "q_ch_sql_battery9",
    oracle="""
    SELECT doc_id, unnest(ARRAY[lang, source]) AS tag,
           unnest(ARRAY[n_chars, n_chars * 2]) AS weight
    FROM documents
    WHERE doc_id % 7 = 0
    """,
)
def q_ch_sql_battery9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-array ``ARRAY JOIN a AS x, b AS y`` — ClickHouse zips the
    arrays POSITIONALLY (row i pairs a[i] with b[i]; unequal lengths
    are an error, which the render enforces via a per-row
    raise_error CASE).  The oracle is DuckDB's independent
    Postgres-style zip: two ``unnest`` calls in one select list.
    Rendered as posexplode of the anchor + chained element_at lateral
    views — map-side only, no shuffle, scale-free."""
    _docs_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT doc_id, tag, weight
        FROM documents
        ARRAY JOIN [lang, source] AS tag, [n_chars, n_chars * 2] AS weight
        WHERE doc_id % 7 = 0
        """,
    )


@query(
    "q_ch_sql_battery9b",
    oracle="""
    SELECT tags, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(ARRAY[lang, source]) AS tags FROM documents
    ) t
    GROUP BY tags
    ORDER BY n DESC, tags
    """,
)
def q_ch_sql_battery9b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare ``ARRAY JOIN arr`` — no alias, so the unnested ELEMENT
    replaces the array column in scope (CH's most common spelling;
    previously passed through untranslated and mis-parsed as a table
    join).  The render wraps the relation in a subquery projecting
    ``* EXCEPT`` so the element can legally shadow its source column,
    then groups by the element."""
    _docs_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT tags, count() AS n
        FROM (SELECT [lang, source] AS tags FROM documents) d
        ARRAY JOIN tags
        GROUP BY tags
        ORDER BY n DESC, tags
        """,
    )


@query(
    "q_ch_sql_battery9c",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY lang
    HAVING COUNT(*) > 40
    UNION ALL
    SELECT NULL AS lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    """,
)
def q_ch_sql_battery9c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY … WITH TOTALS HAVING`` — the totals row must
    SURVIVE the HAVING filter (ClickHouse always emits it; under the
    default totals_mode = 'before_having' it aggregates ALL source
    rows).  The oracle is a hand-built UNION ALL: filtered per-group
    rows plus an UNCONDITIONAL whole-table row — a render that lets
    HAVING drop the totals row cannot hash-match it."""
    _docs_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT lang, count() AS n, sum(n_chars) AS chars
        FROM documents
        GROUP BY lang WITH TOTALS
        HAVING count() > 40
        """,
    )


@query(
    "q_ch_sql_battery9d",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS lo_id,
           CAST(MAX(event_id) AS BIGINT) AS hi_id,
           CAST(SUM(CAST(user_id AS BIGINT)) AS BIGINT) AS uid_sum
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) >= '33333333'
      AND substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < '66666666'
    """,
)
def q_ch_sql_battery9d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SAMPLE 0.2 OFFSET 0.2`` — ClickHouse's relative sample takes
    the [m, m+k) slice of the sampling-key hash space: deterministic,
    repeatable, and disjoint across OFFSET strata (how distributed
    workers split a table).  The render is an md5 hex-range predicate
    over the DECLARED sampling key (set_sample_key ≙ the table's
    SAMPLE BY clause); the oracle spells the identical predicate, so
    both engines must pick the same row SET — aggregates over the
    slice pin membership, not just cardinality.  Scale posture: the
    predicate is a map-side filter pushed to the scan; no shuffle."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    set_sample_key("events", "event_id")
    return run(
        spark,
        """
        SELECT count() AS n,
               min(event_id) AS lo_id,
               max(event_id) AS hi_id,
               sum(CAST(user_id AS BIGINT)) AS uid_sum
        FROM events SAMPLE 0.2 OFFSET 0.2
        """,
    )


@query(
    "q_ch_sql_battery9e",
    oracle="""
    SELECT lang AS _1, CAST(COUNT(*) AS BIGINT) AS _2,
           CAST(MAX(n_chars) AS BIGINT) AS widest
    FROM documents
    GROUP BY lang
    ORDER BY _1
    """,
)
def q_ch_sql_battery9e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``untuple()`` + tuple ``.N`` access — tuple() renders to a
    named_struct with positional ``_N`` fields; untuple(t) expands
    them into columns via the inline(array(t)) generator (t.* only
    resolves for column references) and ``tp.2``-style access reads a
    single field.  Column names ``_1``/``_2`` are the CH-compatible
    positional names, matched by the oracle's aliases."""
    _docs_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT untuple(tp) , tuple(mx, mx).2 AS widest
        FROM (
            SELECT tuple(lang, count()) AS tp, max(n_chars) AS mx
            FROM documents GROUP BY lang
        ) g
        ORDER BY tp.1
        """,
    )


@query(
    "q_ch_sql_battery9f",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN CAST([] AS VARCHAR[])
                    ELSE ARRAY[lang, source] END AS tags,
               CASE WHEN doc_id % 5 = 0 THEN CAST([] AS BIGINT[])
                    ELSE ARRAY[n_chars, n_chars * 2] END AS ws
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           unnest(CASE WHEN len(tags) = 0
                       THEN [CAST(NULL AS VARCHAR)] ELSE tags END) AS tag,
           unnest(CASE WHEN len(ws) = 0
                       THEN [CAST(NULL AS BIGINT)] ELSE ws END) AS weight
    FROM d
    """,
)
def q_ch_sql_battery9f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``LEFT ARRAY JOIN a AS x, b AS y`` with EMPTY arrays — the
    empty-array rows survive with NULL elements (CH's LEFT form; the
    inner form drops them).  Pinned against a DuckDB oracle that
    models LEFT by substituting a [NULL] singleton for empty arrays
    before the zip-unnest.  This row also pins the try_element_at
    render: Spark's OUTER generator feeds the chained zip generator
    an internal pos of -1 before its null-out projection, so a plain
    element_at throws INVALID_ARRAY_INDEX (found live, round 15)."""
    _docs_view(spark, sf_dir)
    return run(
        spark,
        """
        SELECT doc_id, tag, weight
        FROM (
            SELECT doc_id,
                   if(doc_id % 5 = 0, [], [lang, source]) AS tags,
                   if(doc_id % 5 = 0,
                      arrayResize([1], 0),
                      [n_chars, n_chars * 2]) AS ws
            FROM documents WHERE doc_id % 3 = 0
        ) d
        LEFT ARRAY JOIN tags AS tag, ws AS weight
        """,
    )


@query(
    "q_ch_ddl_alter",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), '202401', CAST(10   AS DOUBLE)),
        (CAST(2 AS BIGINT), '202401', CAST(20   AS DOUBLE)),
        (CAST(3 AS BIGINT), '202402', CAST(30   AS DOUBLE)),
        (CAST(4 AS BIGINT), '202402', CAST(40   AS DOUBLE)),
        (CAST(5 AS BIGINT), '202403', CAST(1050 AS DOUBLE))
    ) AS t(k, part, val)
    """,
)
def q_ch_ddl_alter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 ALTER surface under driver correctness: a scratch
    PARTITION BY warehouse runs the literal statements

    - ``RENAME COLUMN v TO val`` (INSTANT metadata — files written
      before it keep the old name; schema-on-read coalesces through
      the recorded history),
    - an INSERT after the rename (mixed-name files now on disk),
    - ``MODIFY COLUMN val Float64`` (the data-REWRITING alter, as in
      ClickHouse where MODIFY is a mutation: rewrites every file via
      the crash-safe swap — normalizing the mixed names — and casts),
    - ``UPDATE val = val + 1000 IN PARTITION '202403'`` over the
      renamed+cast column,
    - a ``DETACH PARTITION '202404' `` / ``ATTACH PARTITION
      '202404'`` round trip plus a final ``DROP PARTITION '202404'``
      (all O(1) directory renames — PARTITION_LIFECYCLE_r15.json
      certifies flat time at 10M rows).

    Content is fixed (sf-independent); the oracle is the
    hand-computed post-ALTER table."""
    import os
    import shutil
    import tempfile

    from clickhub_spark.ddl import Warehouse

    root = tempfile.gettempdir() + f"/chwh_ddl_alter_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(root)
    wh.execute(
        "CREATE TABLE default.al (`k` Int64, `time` DateTime, `v` Int64) "
        "ENGINE = MergeTree PARTITION BY toYYYYMM(time) ORDER BY (k)"
    )
    wh.execute(
        "INSERT INTO default.al (k, time, v) VALUES "
        "(1, '2024-01-05 00:00:00', 10), (2, '2024-01-20 00:00:00', 20), "
        "(3, '2024-02-01 00:00:00', 30), (5, '2024-03-01 00:00:00', 50)",
        spark=spark,
    )
    outs = [wh.execute("ALTER TABLE default.al RENAME COLUMN v TO val")]
    # mixed-name files: this INSERT writes `val`, the first wrote `v`
    wh.execute(
        "INSERT INTO default.al (k, time, val) VALUES "
        "(4, '2024-02-09 00:00:00', 40), (6, '2024-04-01 00:00:00', 60)",
        spark=spark,
    )
    outs.append(
        wh.execute("ALTER TABLE default.al MODIFY COLUMN val Float64",
                   spark=spark)
    )
    outs.append(
        wh.execute(
            "ALTER TABLE default.al UPDATE val = val + 1000 "
            "IN PARTITION '202403' WHERE k = 5",
            spark=spark,
        )
    )
    outs.append(wh.execute("ALTER TABLE default.al DETACH PARTITION '202404'"))
    outs.append(wh.execute("ALTER TABLE default.al ATTACH PARTITION '202404'"))
    outs.append(wh.execute("ALTER TABLE default.al DROP PARTITION '202404'"))
    want = ("ok", "ok", None, "detached partition 202404",
            "attached partition 202404", "dropped partition 202404")
    for got, exp in zip(outs, want):
        if exp is not None and not str(got).startswith(exp.split()[0]):
            raise AssertionError(f"ALTER statement path broke: {outs!r}")
    wh.register_views(spark)
    # CAST the partition dir value explicitly: hive partition-column
    # type inference flips numeric-looking values between int and
    # string depending on which writer produced the directory
    return run(
        spark,
        "SELECT k, CAST(_partition_id AS String) AS part, val "
        "FROM default_al ORDER BY k",
    )


@query(
    "q_ch_sql_battery10",
    oracle="""
    SELECT CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber
    FROM lineitem
    """,
)
def q_ch_sql_battery10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``COLUMNS('regex') APPLY(fn)`` — ClickHouse's dynamic column
    selector (pick columns by NAME pattern, then apply an aggregate
    to each; the wide-table idiom).  Expansion needs the schema, so
    it is a run()-level session-aware rewrite like star-APPLY; CH
    names the outputs ``fn(col)``, matched by the oracle's quoted
    aliases.  The regex picks the two integral lineitem measures so
    the sums are exact at every SF."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    out = run(
        spark,
        "SELECT COLUMNS('^l_(quantity|linenumber)$') APPLY(sum) "
        "FROM lineitem",
    )
    # the registry convention forbids parens in output names (driver
    # compares sorted column names); CH's fn(col) spelling itself is
    # pinned by tests/test_sql_compat.py::test_columns_regex_selector
    from pyspark.sql import functions as F

    return out.select(
        F.col("`sum(l_quantity)`").alias("sum_qty"),
        F.col("`sum(l_linenumber)`").alias("sum_linenumber"),
    )
