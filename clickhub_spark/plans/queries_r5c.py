"""Round-5 third batch: the Python DataSource API surface
(custom batch sources with planned partitions, planning-time filter
pushdown, a replayable stream source — SURVEY §2.A5 as first-class
Spark sources instead of out-of-engine producers) and Bloom-filter
membership screening for incremental dedup (§2.J4/J5's scale tier).

Each query pairs a Spark builder with a DuckDB oracle (registry
contract).  The gitlog query reads a DETERMINISTIC fixture repository
(fixed author/committer identities and timestamps) so its oracle is a
literal VALUES table.
"""

from __future__ import annotations

import os
import subprocess

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhub_spark.catalog import load
from clickhub_spark.operators import bloom
from clickhub_spark.plans.registry import query
from clickhub_spark.sources.pyds import register_sources


@query(
    "q_source_numbers_ds",
    oracle="""
    WITH n AS (SELECT x AS num FROM generate_series(0, 49999) t(x))
    SELECT CAST(num % 7 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(num) AS BIGINT) AS total,
           CAST(MIN(num) AS BIGINT) AS lo,
           CAST(MAX(num) AS BIGINT) AS hi
    FROM n GROUP BY bucket ORDER BY bucket
    """,
)
def q_source_numbers_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource generator (SURVEY §2.A5; ClickHouse
    ``numbers(N)`` as a REGISTERED source, not just spark.range):
    ``partitions()`` plans 16 contiguous ranges on the driver, each
    task materializes its slice as one Arrow record batch — zero data
    read, N-way parallel, the same scale shape as a parquet scan.
    (The pushdown variant of this source — planning-time partition
    pruning from Catalyst-pushed comparison filters — is plan-tested
    in tests/test_pyds.py; this registered form stays pushdown-free so
    it runs on a vanilla session where
    spark.sql.python.filterPushdown.enabled is false.)

    r16 build-cost trim (guide §5 — driver): register ONLY the
    numbers source (not all five classes; each register cloudpickles
    a class to the JVM) and pass the schema explicitly so planning
    skips the ``schema()`` Python-worker round-trip.  Same source,
    same rows; fresh-session build measured 9.5 s → ~2 s."""
    from clickhub_spark.sources.pyds import NumbersDataSource

    register_sources(spark, only=(NumbersDataSource,))
    n = (
        spark.read.format("engine_numbers")
        .schema("num BIGINT")
        .option("n", 50_000)
        .option("numPartitions", 16)
        .load()
    )
    return (
        n.groupBy((F.col("num") % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("num").alias("total"),
            F.min("num").alias("lo"),
            F.max("num").alias("hi"),
        )
        .orderBy("bucket")
    )


#: (author, email, authored_at, subject) per fixture commit,
#: oldest first.  Timestamps fixed so the repo is bit-stable.
_FIXTURE_COMMITS = [
    ("Ada", "ada@example.com", 1704067200, "init schema"),
    ("Ada", "ada@example.com", 1704153600, "add parser"),
    ("Grace", "grace@example.com", 1704240000, "fix off-by-one"),
    ("Grace", "grace@example.com", 1704326400, "vectorize inner loop"),
    ("Ada", "ada@example.com", 1704412800, "add bench"),
    ("Linus", "linus@example.com", 1704499200, "merge-ready cleanup"),
]


def _fixture_repo() -> str:
    """Create (once) a deterministic git repo for the gitlog source.
    Keyed by content version; safe to reuse across sessions."""
    root = os.path.join("/tmp", "spark_graft_gitlog_fixture_v1")
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return root
    subprocess.run(["rm", "-rf", root], check=True)
    os.makedirs(root)
    env = dict(os.environ)
    run = lambda *a: subprocess.run(  # noqa: E731
        ["git", "-C", root, *a], env=env, check=True, capture_output=True
    )
    run("init", "-q", "-b", "main")
    for i, (name, email, ts, subject) in enumerate(_FIXTURE_COMMITS):
        with open(os.path.join(root, "file.txt"), "a") as f:
            f.write(f"line {i}\n")
        env.update(
            GIT_AUTHOR_NAME=name,
            GIT_AUTHOR_EMAIL=email,
            GIT_AUTHOR_DATE=f"{ts} +0000",
            GIT_COMMITTER_NAME=name,
            GIT_COMMITTER_EMAIL=email,
            GIT_COMMITTER_DATE=f"{ts} +0000",
        )
        run("add", "file.txt")
        run("commit", "-q", "-m", subject)
    with open(marker, "w") as f:
        f.write("ok")
    return root


def _gitlog_oracle() -> str:
    # newest-first git log order -> commit_idx 0 is the LAST fixture
    # commit; restate the expected table literally.
    rows = ",\n      ".join(
        f"({idx}, '{name}', '{email}', {ts}, '{subject}')"
        for idx, (name, email, ts, subject) in enumerate(reversed(_FIXTURE_COMMITS))
    )
    return f"""
    SELECT * FROM (VALUES
      {rows}
    ) AS t(commit_idx, author, author_email, authored_at, subject)
    ORDER BY commit_idx
    """


@query("q_source_gitlog", oracle=_gitlog_oracle())
def q_source_gitlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Git history as a first-class Spark source (SURVEY §2.A5: the
    reference shells out to ``clickhouse git-import`` and ingests its
    TSVs — reference repo/importer.py:86-108; here
    ``spark.read.format("gitlog")`` IS the table).  Planning counts
    commits once; each task reads its own --skip/--max-count slice,
    so a deep history fans out across the cluster.  Reads a
    deterministic fixture repo; the oracle is the literal expected
    history."""
    from clickhub_spark.sources.pyds import GitLogDataSource

    # r16: register only the gitlog class + explicit schema — same
    # build-cost trim as q_source_numbers_ds (guide §5).
    register_sources(spark, only=(GitLogDataSource,))
    repo = _fixture_repo()
    df = (
        spark.read.format("gitlog")
        .schema(
            "commit_idx BIGINT, hash STRING, author STRING, "
            "author_email STRING, authored_at BIGINT, n_parents INT, "
            "subject STRING"
        )
        .option("path", repo)
        .option("numPartitions", 3)
        .load()
    )
    return df.select(
        "commit_idx", "author", "author_email", "authored_at", "subject"
    ).orderBy("commit_idx")


@query(
    "q_llm_dedup_bloom",
    oracle="""
    SELECT CAST(b.doc_id AS BIGINT) AS doc_id
    FROM documents b
    WHERE b.doc_id < 300
      AND EXISTS (SELECT 1 FROM documents h
                  WHERE h.doc_id >= 100 AND h.text = b.text)
    ORDER BY doc_id
    """,
)
def q_llm_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-screened incremental dedup (SURVEY §2.J4 scale tier):
    an already-ingested history (doc_id ≥ 100) and an incoming batch
    (doc_id < 300) that OVERLAPS it — re-delivery, the incremental-
    ingest case — so [100, 300) are true members and [0, 100) are
    true non-members.  A 256 Kib bloom over xxhash64(history.text) is
    built from partition-partial bitmaps (one m/8-byte row per
    partition, OR-reduced in one task) and probed MAP-SIDE on the
    batch; only bloom survivors reach the exact verify semi-join, and
    since blooms have no false negatives the screened result equals
    the plain semi-join — which is exactly the oracle relation.  At
    100 TB: build once over the corpus, persist the bitmap, screen
    every incoming batch without re-shuffling history; FP rate
    (unit-bounded in test_bloom.py) is the only wasted join traffic."""
    docs = load(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") >= 100)
    batch = docs.where(F.col("doc_id") < 300)
    m_bits, k = 1 << 18, 6
    bitmap = bloom.build_bloom(
        history.select(F.xxhash64("text").alias("h")), "h", m_bits, k
    )
    candidates = bloom.might_contain(
        batch.withColumn("h", F.xxhash64("text")), "h", bitmap, k
    )
    # no .distinct() on the build side: left_semi semantics are
    # identical either way, and deduplicating would add a full extra
    # Exchange+HashAggregate over history on every batch
    verified = candidates.join(history.select("text"), "text", "left_semi")
    return verified.select("doc_id").orderBy("doc_id")


@query(
    "q_llm_decontam_bloom",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
        WHERE len(ws) >= 3
    ), bench AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    ), corpus AS (
        SELECT * FROM sh WHERE doc_id % 50 <> 0
    )
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM corpus c JOIN bench b USING (shingle)
    GROUP BY c.doc_id HAVING COUNT(*) >= 2
    ORDER BY doc_id
    """,
)
def q_llm_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-screened benchmark decontamination — the scale tier of
    q_llm_contamination for when the pooled eval-suite shingle set is
    too large to BROADCAST as a join hash relation (tens of GB across
    suites): a fixed 512 Kib bloom over the benchmark shingles screens
    corpus shingles MAP-SIDE, and only survivors (true matches + the
    bounded FP slice) reach the exact join.  No false negatives ⇒
    identical output to the broadcast-join form, which is exactly the
    oracle (same SQL as q_llm_contamination + stable ORDER BY)."""
    from clickhub_spark.operators.textops import shingles

    docs = load(spark, sf_dir, "documents")
    corpus_sh = shingles(docs.where(F.col("doc_id") % 50 != 0), "text", "doc_id", 3)
    bench_sh_raw = shingles(
        docs.where(F.col("doc_id") % 50 == 0), "text", "doc_id", 3
    ).select("shingle")
    # the JOIN side must be globally distinct (n_shared counts pairs);
    # the bloom BUILD side must not pay that exchange — inserting a
    # shingle twice sets the same bits (r17, guide §2.4: the distinct
    # aggregate+exchange in the eager build job was pure overhead)
    bench_sh = bench_sh_raw.distinct()
    m_bits, k = 1 << 19, 6
    bitmap = bloom.build_bloom(
        bench_sh_raw.select(F.xxhash64("shingle").alias("h")), "h", m_bits, k
    )
    screened = bloom.might_contain(
        corpus_sh.withColumn("h", F.xxhash64("shingle")), "h", bitmap, k
    )
    return (
        screened.join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
        .orderBy("doc_id")
    )


@query(
    "q_win_interpolate",
    oracle="""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               MAX(value) AS v
        FROM events WHERE user_id < 40 GROUP BY user_id, h
    ), bounds AS (
        SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id
    ), grid AS (
        SELECT b.user_id, t.h
        FROM bounds b, UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS t(h)
    ), joined AS (
        SELECT g.user_id, g.h, hv.v FROM grid g
        LEFT JOIN hourly hv ON hv.user_id = g.user_id AND hv.h = g.h
    ), ctx AS (
        SELECT user_id, h, v,
            last_value(v IGNORE NULLS) OVER w_past AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER w_past AS ph,
            first_value(v IGNORE NULLS) OVER w_fut AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER w_fut AS nh
        FROM joined
        WINDOW
          w_past AS (PARTITION BY user_id ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_fut AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, CAST(h AS TIMESTAMP) AS h,
        FLOOR((CASE
            WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              pv + (nv - pv) * (CAST(epoch(h) - epoch(ph) AS DOUBLE)
                                / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
            WHEN pv IS NOT NULL THEN pv ELSE nv END) * 10000) / 10000
            AS v_interp
    FROM ctx ORDER BY user_id, h
    """,
)
def q_win_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation over a dense per-user hourly grid
    (ClickHouse ORDER BY ... WITH FILL ... INTERPOLATE — SURVEY
    §2.H/F extension beyond q_fill_gaps' zero-fill and q_win_locf's
    carry-forward): missing hours get pv + (nv-pv)·Δt/T between the
    bracketing observations, edges fall back to nearest-known.  One
    user_id shuffle feeds grid-build, the grid join, and BOTH
    direction windows; everything else is map-side expression math —
    the plan a 100 TB telemetry backfill needs (no global sort, per-
    key parallelism)."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 40)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max("value").alias("v"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    from pyspark.sql.window import Window

    w_past = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fut = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("v").isNotNull(), F.col("h"))
    ctx = joined.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_past).alias("pv"),
        F.last(known_h, ignorenulls=True).over(w_past).alias("ph"),
        F.first("v", ignorenulls=True).over(w_fut).alias("nv"),
        F.first(known_h, ignorenulls=True).over(w_fut).alias("nh"),
    )
    dt = F.unix_timestamp("h") - F.unix_timestamp("ph")
    span = F.unix_timestamp("nh") - F.unix_timestamp("ph")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv")) * (dt.cast("double") / span.cast("double")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    # floor-scale instead of ROUND: both engines compute the SAME
    # IEEE double here (identical operands + op order), but their
    # ROUND implementations differ on exact decimal halves (Spark
    # rounds the shortest decimal rendering, DuckDB the binary value)
    # — 2-decimal inputs times x/8 fractions land on halves
    # systematically.  FLOOR of the shared binary is engine-stable.
    return ctx.select(
        "user_id",
        "h",
        (F.floor(interp * 10000) / 10000).alias("v_interp"),
    ).orderBy("user_id", "h")


@query(
    "q_agg_quantile_weighted",
    oracle="""
    WITH w AS (
        SELECT event_type, value AS v,
               CAST(length(props) AS DOUBLE) AS wt
        FROM events WHERE value IS NOT NULL
    ), ranked AS (
        SELECT event_type, v, wt,
               SUM(wt) OVER (PARTITION BY event_type ORDER BY v, wt
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(wt) OVER (PARTITION BY event_type) AS total
        FROM w
    )
    SELECT event_type, ROUND(MIN(v), 4) AS wmedian
    FROM ranked WHERE cum >= 0.5 * total
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (ClickHouse quantileExactWeighted — SURVEY
    §2.D13 extension): smallest value whose cumulative weight reaches
    half the group's total.  One value-ordered window per group plus a
    min-aggregate — both partial-aggregated on the same event_type
    shuffle; identical tie order (v, wt) pinned on both sides so the
    engines select the same row."""
    from pyspark.sql.window import Window

    w = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("value").alias("v"),
            F.length("props").cast("double").alias("wt"),
        )
    )
    cum = (
        Window.partitionBy("event_type")
        .orderBy("v", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = w.select(
        "event_type",
        "v",
        F.sum("wt").over(cum).alias("cum"),
        F.sum("wt").over(Window.partitionBy("event_type")).alias("total"),
    )
    return (
        ranked.where(F.col("cum") >= 0.5 * F.col("total"))
        .groupBy("event_type")
        .agg(F.round(F.min("v"), 4).alias("wmedian"))
        .orderBy("event_type")
    )


@query(
    "q_agg_resample",
    oracle="""
    WITH b AS (
        SELECT o_orderstatus,
               CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
               o_totalprice
        FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 300000
    ), s AS (
        SELECT o_orderstatus, bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM b GROUP BY o_orderstatus, bucket
    ), g AS (
        SELECT DISTINCT o_orderstatus, gs.bucket
        FROM s, UNNEST(generate_series(0, 5)) AS gs(bucket)
    )
    SELECT g.o_orderstatus,
           string_agg(CAST(COALESCE(s.cnt, 0) AS VARCHAR), ','
                      ORDER BY g.bucket) AS cnt_per_bucket,
           string_agg(CAST(CAST(COALESCE(s.total, 0) AS DECIMAL(18,2))
                           AS VARCHAR), ','
                      ORDER BY g.bucket) AS sum_per_bucket
    FROM g LEFT JOIN s ON s.o_orderstatus = g.o_orderstatus
                      AND s.bucket = g.bucket
    GROUP BY g.o_orderstatus ORDER BY g.o_orderstatus
    """,
)
def q_agg_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-Resample aggregate combinator (ClickHouse
    countResample(0, 300000, 50000) / sumResample — SURVEY §2.D
    combinator family): fixed [start, end, step) buckets of the
    resample key, one dense series per group with empty buckets
    zero-filled.  One (group, bucket) hash aggregate then a
    series-build per group — the bucket grid is a compile-time
    ``sequence`` literal mapped over the collected pairs, so no
    second data-driven join or Expand is needed.  Both series export
    as CSV strings (sums rendered through DECIMAL(18,2) so the two
    engines pad identically) — the correctness driver's pandas
    canonicalizer cannot sort array cells (round-6 driver-red
    lesson)."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_totalprice") >= 0) & (F.col("o_totalprice") < 300_000)
    )
    per_bucket = orders.groupBy(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") / 50_000).cast("bigint").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
    pairs = per_bucket.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", F.struct("cnt", "total")))
        ).alias("m")
    )
    buckets = F.sequence(F.lit(0).cast("bigint"), F.lit(5).cast("bigint"))
    cnt_arr = F.transform(
        buckets,
        lambda b: F.coalesce(F.col("m")[b]["cnt"], F.lit(0).cast("bigint")).cast(
            "string"
        ),
    )
    # coalesce AFTER the decimal cast too: a bucket sum outside
    # DECIMAL(18,2) range would cast to NULL and concat_ws would
    # silently skip it, misaligning the series (review r7; the oracle
    # hard-errors on the same overflow)
    sum_arr = F.transform(
        buckets,
        lambda b: F.coalesce(
            F.coalesce(F.col("m")[b]["total"], F.lit(0.0))
            .cast("decimal(18,2)")
            .cast("string"),
            F.lit("null"),
        ),
    )
    return pairs.select(
        "o_orderstatus",
        F.concat_ws(",", cnt_arr).alias("cnt_per_bucket"),
        F.concat_ws(",", sum_arr).alias("sum_per_bucket"),
    ).orderBy("o_orderstatus")


@query(
    "q_agg_sample_group",
    oracle="""
    WITH r AS (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
                   AS rn
        FROM events
    )
    SELECT event_type,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
               AS sample_ids
    FROM r WHERE rn <= 5 GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group deterministic k-sample (ClickHouse
    groupArraySample(5) — SURVEY §2.D combinator family): the k rows
    with the smallest md5(id) per group — a hash-ordered reservoir
    that is uniform over ids, engine-independent (md5 agrees across
    engines where RAND() cannot), and GROWTH-STABLE: adding rows only
    replaces samples whose hash ranks below the newcomers.  Plan: one
    group shuffle, TOP-K-per-group window, id-sorted CSV collect (a
    scalar wire form — the correctness driver's pandas canonicalizer
    cannot sort array cells; round-6 driver-red lesson)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.md5(F.col("event_id").cast("string")), "event_id"
        )
    )
    return (
        ev.select("event_type", "event_id", rn.alias("rn"))
        .where(F.col("rn") <= 5)
        .groupBy("event_type")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("event_id")),
                    lambda v: v.cast("string"),
                ),
            ).alias("sample_ids")
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_max_intersections",
    oracle="""
    WITH iv AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
               CAST(FLOOR(epoch(ts)) AS BIGINT) + CAST(FLOOR(value * 10) AS BIGINT) AS e
        FROM events WHERE value > 0
    ), pts AS (
        SELECT event_type, s AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta FROM iv
    ), sweep AS (
        SELECT event_type,
               SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS live
        FROM pts
    )
    SELECT event_type, CAST(MAX(live) AS BIGINT) AS max_concurrent
    FROM sweep GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxIntersections (ClickHouse interval-concurrency aggregate —
    SURVEY §2.D family): peak number of simultaneously-open intervals
    per group via the classic sweep — every interval contributes a
    (+1 at start, -1 at end) point, one (t, delta)-ordered running sum
    per group, max.  Half-open [s, e) semantics pinned by ordering
    deltas ascending (ends close before coincident starts).  One
    event_type shuffle; the sweep is a single window pass — no
    interval self-join, which is the quadratic trap at 100 TB."""
    ev = load(spark, sf_dir, "events").where(F.col("value") > 0)
    s = F.unix_timestamp("ts").alias("t")
    e = (F.unix_timestamp("ts") + F.floor(F.col("value") * 10).cast("bigint")).alias("t")
    starts = ev.select("event_type", s, F.lit(1).alias("delta"))
    ends = ev.select("event_type", e, F.lit(-1).alias("delta"))
    from pyspark.sql.window import Window

    sweep = Window.partitionBy("event_type").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        starts.unionAll(ends)
        .select("event_type", F.sum("delta").over(sweep).alias("live"))
        .groupBy("event_type")
        .agg(F.max("live").alias("max_concurrent"))
        .orderBy("event_type")
    )


@query(
    "q_agg_uniq_upto",
    oracle="""
    SELECT o_orderpriority,
           CAST(LEAST(COUNT(DISTINCT o_custkey), 6) AS BIGINT) AS uniq_upto_5,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_agg_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqUpTo(5) (ClickHouse capped distinct — SURVEY §2.D9/D10
    family): exact distinct count saturating at N+1, the "more than N
    distinct users?" predicate that needs only N+1 states per group
    instead of a full distinct set.  Spark's exact count_distinct is
    capped post-agg (semantically identical); a memory-capped
    implementation would live in an Aggregator — at 100 TB the approx
    tier (q_agg_approx_distinct) is the recommended path anyway."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.least(F.count_distinct("o_custkey"), F.lit(6)).alias("uniq_upto_5"),
            F.count_distinct("o_orderstatus").alias("n_status"),
        )
        .orderBy("o_orderpriority")
    )


@query("q_llm_pca")  # no SQL oracle: eigendecomposition is not
# expressible in DuckDB; correctness is pinned by tests/test_pca.py
# (distributed fit ≡ single-node numpy fit, orthonormal components,
# descending explained variance, reduced-space kNN recall).
def q_llm_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA projection of the embeddings table (SURVEY
    §2.J6 family — the dimensionality-reduction step before ANN/
    clustering at scale): 64-dim vectors to the top-8 principal axes.
    Fit is ONE map-side pass of partial (count, Σx, ΣxxT) moments
    combined in a single tiny reduce; the d×d eigh runs on the driver
    (bounded by embedding width, not corpus size); transform is a
    map-only Arrow matmul against the broadcast component matrix —
    the data is never shuffled and never read twice
    (operators/pca.py)."""
    from clickhub_spark.operators.pca import fit_pca, transform_pca

    emb = load(spark, sf_dir, "embeddings")
    mean, comps, _ = fit_pca(emb, "embedding", k=8)
    out = transform_pca(emb, "embedding", mean, comps, ndigits=4)
    # scalar wire form: the driver canonicalizes rows-only results
    # too, and its pandas sort cannot handle array cells (round-6
    # driver-red lesson) — export the projection as a CSV string,
    # components rendered through DECIMAL(18,4) for stable padding
    # and IEEE -0.0 normalization
    return out.select(
        "vec_id",
        "label",
        F.concat_ws(
            ",",
            F.transform(
                F.col("pca"),
                lambda x: x.cast("decimal(18,4)").cast("string"),
            ),
        ).alias("pca8"),
    ).orderBy("vec_id")


@query(
    "q_llm_url_canon",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'HTTPS://GitHub.COM:443/' || source || '/' || lang
                 || '/?utm_source=x&v=2&doc=' || doc_id
                 || '&utm_campaign=y#frag' AS url
        FROM documents
    ), parts AS (
        SELECT doc_id,
               lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
               lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
               regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS query
        FROM u
    ), cleaned AS (
        SELECT doc_id, scheme,
               regexp_replace(hostport, ':(443|80)$', '') AS host,
               regexp_replace(path, '/+$', '') AS path,
               array_to_string(
                 list_sort(list_filter(string_split(query, '&'),
                                       q -> NOT regexp_matches(q, '^(utm_[^=]*|fbclid)='))),
                 '&') AS canon_query
        FROM parts
    )
    SELECT doc_id,
           scheme || '://' || host || path
             || CASE WHEN canon_query = '' THEN '' ELSE '?' || canon_query END
               AS canon_url
    FROM cleaned ORDER BY doc_id
    """,
)
def q_llm_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for web-corpus dedup (the step before any
    URL-keyed dedup/frequency pass in a crawl pipeline): lowercase
    scheme+host, strip default ports, strip trailing slashes, drop
    the fragment, remove tracking parameters (utm_*, fbclid), and
    SORT the surviving query params so param order can't split a
    page's identity.  All JVM builtins (regexp + higher-order array
    fns) — map-only, no UDF, no shuffle before the presentation
    sort."""
    u = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://GitHub.COM:443/"),
            F.col("source"),
            F.lit("/"),
            F.col("lang"),
            F.lit("/?utm_source=x&v=2&doc="),
            F.col("doc_id"),
            F.lit("&utm_campaign=y#frag"),
        ).alias("url"),
    )
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1))
    path = F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    querystr = F.regexp_extract("url", r"\?([^#]*)", 1)
    host = F.regexp_replace(hostport, r":(443|80)$", "")
    path = F.regexp_replace(path, r"/+$", "")
    canon_q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(querystr, "&"),
                lambda q: ~q.rlike(r"^(utm_[^=]*|fbclid)="),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )
    return u.select("doc_id", canon.alias("canon_url")).orderBy("doc_id")


@query(
    "q_llm_text_normalize",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               text || '  Cafe' || 'e' || chr(769) || chr(9)
                    || 'TAB' AS raw
        FROM documents
    ), n AS (
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(lower(nfc_normalize(raw)),
                                  '[\\x00-\\x1f]', ' ', 'g'),
                   ' +', ' ', 'g')) AS norm
        FROM t
    )
    SELECT doc_id, md5(norm) AS norm_md5,
           CAST(length(norm) AS BIGINT) AS n_chars
    FROM n ORDER BY doc_id
    """,
)
def q_llm_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text normalization for corpus cleaning (SURVEY §2.J7
    family — the canonical-form pass every multilingual pipeline runs
    before hashing/dedup): NFC composition (so 'e'+U+0301 and 'é'
    hash identically), control-char removal, whitespace collapse,
    case folding.  NFC needs ICU-class tables Spark SQL lacks, so the
    normalize step is an Arrow-batched pandas UDF over Python's
    unicodedata (the Unicode-standard reference implementation);
    everything around it stays JVM-side.  The oracle exercises the
    same pipe via DuckDB's nfc_normalize, including an injected
    decomposed accent + tab."""

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda v: None if v is None else unicodedata.normalize("NFC", v))

    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("  Cafe" + "é" + "\t" + "TAB")
        ).alias("raw"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(nfc(F.col("raw"))), r"[\x00-\x1f]", " "),
            " +",
            " ",
        )
    )
    return t.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("bigint").alias("n_chars"),
    ).orderBy("doc_id")


@query(
    "q_agg_interval_length_sum",
    oracle="""
    WITH iv AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
               CAST(FLOOR(epoch(ts)) AS BIGINT) + CAST(FLOOR(value * 10) AS BIGINT) AS e
        FROM events WHERE value > 0
    ), pts AS (
        SELECT event_type, s AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta FROM iv
    ), sweep AS (
        SELECT event_type, t,
               SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS live,
               LEAD(t) OVER (PARTITION BY event_type ORDER BY t, delta) AS nxt
        FROM pts
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN live > 0 THEN nxt - t ELSE 0 END) AS BIGINT)
               AS covered_sec
    FROM sweep GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intervalLengthSum (ClickHouse union-length-of-intervals
    aggregate): total time covered by ≥1 open interval per group —
    the same +1/-1 sweep as q_agg_max_intersections, summing segment
    lengths while the live count is positive instead of maxing it.
    Still one window pass, no interval self-join, one group shuffle."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").where(F.col("value") > 0)
    s = F.unix_timestamp("ts").alias("t")
    e = (F.unix_timestamp("ts") + F.floor(F.col("value") * 10).cast("bigint")).alias("t")
    pts = ev.select("event_type", s, F.lit(1).alias("delta")).unionAll(
        ev.select("event_type", e, F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("event_type").orderBy("t", "delta")
    sweep = pts.select(
        "event_type",
        "t",
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("live"),
        F.lead("t").over(w).alias("nxt"),
    )
    return (
        sweep.groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("live") > 0, F.col("nxt") - F.col("t")).otherwise(0)
            ).alias("covered_sec")
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_lttb",
    oracle="""
    WITH pt AS (
        SELECT user_id,
               epoch(ts) AS x, value AS y,
               NTILE(20) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS bucket
        FROM events WHERE user_id < 10 AND value IS NOT NULL
    ), anchors AS (
        SELECT user_id, bucket, AVG(x) AS ax, AVG(y) AS ay
        FROM pt GROUP BY user_id, bucket
    ), ranked AS (
        SELECT p.user_id, p.bucket, p.x, p.y,
               ROW_NUMBER() OVER (
                 PARTITION BY p.user_id, p.bucket
                 ORDER BY ABS( (pr.ax - nx.ax) * (p.y - pr.ay)
                             - (pr.ax - p.x) * (nx.ay - pr.ay) ) DESC,
                          p.x, p.y
               ) AS rn
        FROM pt p
        JOIN anchors pr ON pr.user_id = p.user_id AND pr.bucket = p.bucket - 1
        JOIN anchors nx ON nx.user_id = p.user_id AND nx.bucket = p.bucket + 1
    )
    SELECT user_id, bucket, CAST(FLOOR(x) AS BIGINT) AS x_sec, ROUND(y, 4) AS y
    FROM ranked WHERE rn = 1 ORDER BY user_id, bucket
    """,
)
def q_agg_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """largestTriangleThreeBuckets downsampling (ClickHouse's LTTB
    aggregate; Steinarsson 2013): per time bucket keep the point with
    the largest triangle area against the NEIGHBOR BUCKETS' centroids
    — the standard parallel approximation of sequential LTTB (exact
    LTTB anchors on the previously SELECTED point, a chain dependency
    no engine parallelizes; ClickHouse approximates too).  Interior
    buckets only (first/last have no both-side anchors here; CH pins
    the endpoints).  Plan: one user_id shuffle feeds the ntile window
    and the bucket aggregate; anchors are a tiny broadcastable table
    joined back per bucket."""
    from pyspark.sql.window import Window

    pt = (
        load(spark, sf_dir, "events")
        .where((F.col("user_id") < 10) & F.col("value").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("double").alias("x"),
            F.col("value").alias("y"),
            F.ntile(20)
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("bucket"),
        )
    )
    anchors = pt.groupBy("user_id", "bucket").agg(
        F.avg("x").alias("ax"), F.avg("y").alias("ay")
    )
    pr = anchors.select(
        "user_id",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("ax").alias("pax"),
        F.col("ay").alias("pay"),
    )
    nx = anchors.select(
        "user_id",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("ax").alias("nax"),
        F.col("ay").alias("nay"),
    )
    area = F.abs(
        (F.col("pax") - F.col("nax")) * (F.col("y") - F.col("pay"))
        - (F.col("pax") - F.col("x")) * (F.col("nay") - F.col("pay"))
    )
    ranked = (
        pt.join(F.broadcast(pr), ["user_id", "bucket"])
        .join(F.broadcast(nx), ["user_id", "bucket"])
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "bucket").orderBy(
                    area.desc(), "x", "y"
                )
            ),
        )
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "user_id",
            "bucket",
            F.floor("x").cast("bigint").alias("x_sec"),
            F.round("y", 4).alias("y"),
        )
        .orderBy("user_id", "bucket")
    )


@query(
    "q_stream_stateful",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_total,
           ROUND(SUM(value), 2) AS v_total
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch canon of the custom stateful streaming operator
    (streaming/stateful.running_user_totals — applyInPandasWithState,
    SURVEY §2.I): after the last micro-batch the per-user state holds
    exactly this groupBy's (count, sum) — the stream ≡ batch
    equivalence is pinned in tests/test_stateful.py, which drives the
    REAL streaming operator over a rate-limited source and compares
    its final emissions to this aggregate.  State is one fixed-width
    tuple per key, so the store is bounded by key cardinality at any
    corpus size."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.round(F.sum("value"), 2).alias("v_total"),
        )
        .orderBy("user_id")
    )


@query(
    "q_llm_score_normalize",
    oracle="""
    WITH s AS (
        SELECT doc_id, CAST(n_chars AS DOUBLE) AS score FROM documents
    )
    SELECT doc_id,
           ROUND(percent_rank() OVER (ORDER BY score), 6) AS pr
    FROM s ORDER BY doc_id
    """,
)
def q_llm_score_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile normalization of a per-document quality score
    (the LLM-pipeline step that maps raw scores to [0,1] before
    threshold mixing) WITHOUT the global-window trap: a naive
    ``percent_rank() OVER (ORDER BY score)`` plans SinglePartition —
    every row through one task.  Instead: aggregate per-VALUE counts
    (distinct scores ≪ rows), cumsum strictly-smaller counts over
    that small table, and broadcast-join the ranks back onto the
    fact scan.  percent_rank = (#strictly smaller)/(N-1) reproduces
    SQL semantics exactly, ties included — the oracle IS the naive
    window form."""
    from pyspark.sql.window import Window

    s = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("score")
    )
    counts = s.groupBy("score").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranks = counts.select(
        "score",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("n_smaller"),
    )
    total = s.count()
    return (
        s.join(F.broadcast(ranks), "score")
        .select(
            "doc_id",
            F.round(F.col("n_smaller") / F.lit(max(1, total - 1)), 6).alias("pr"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_fn_array_enumerate",
    oracle="""
    WITH a AS (
        SELECT doc_id, string_split(text, ' ')[1:12] AS ws FROM documents
        WHERE len(string_split(text, ' ')) >= 12
    )
    SELECT doc_id,
           array_to_string([len(list_filter(ws[1:i], w -> w = ws[i]))
                            for i in range(1, len(ws)+1)], ',') AS occ_idx
    FROM a ORDER BY doc_id
    """,
)
def q_fn_array_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrayEnumerateUniq (ClickHouse per-element occurrence index —
    SURVEY §2.G5 family): for each array position, how many times has
    this element appeared up to and including it.  Pure array
    higher-order expression (transform over 1..n with a filtered
    prefix count) — no explode, no window, no shuffle; quadratic only
    in the (bounded) array length.  Exported as a CSV string — the
    correctness driver's pandas canonicalizer cannot sort array cells
    (round-6 driver-red lesson); the string cast also erases the
    INT-vs-BIGINT element-width difference between F.size and
    DuckDB len()."""
    a = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.slice(F.split("text", " "), 1, 12).alias("ws"))
        .where(F.size(F.split("text", " ")) >= 12)
    )
    occ = F.transform(
        F.sequence(F.lit(1), F.size("ws")),
        lambda i: F.size(
            F.filter(
                F.slice(F.col("ws"), 1, i),
                lambda w: w == F.get(F.col("ws"), i - 1),
            )
        ).cast("string"),
    )
    return a.select("doc_id", F.concat_ws(",", occ).alias("occ_idx")).orderBy(
        "doc_id"
    )


@query(
    "q_llm_chunk_sentences",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, '. ') AS ss FROM documents
    ), s AS (
        SELECT doc_id, i AS pos, ss[i] AS sent,
               len(string_split(ss[i], ' ')) AS tok
        FROM w, UNNEST(range(1, len(ss) + 1)) t(i)
        WHERE ss[i] <> ''
    ), c AS (
        SELECT doc_id, pos, sent, tok,
               SUM(tok) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM s
    )
    SELECT doc_id,
           CAST(FLOOR(CAST(cum - tok AS DOUBLE) / 40) AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_sent,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           md5(string_agg(sent, '. ' ORDER BY pos)) AS chunk_md5
    FROM c
    GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id
    """,
)
def q_llm_chunk_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aware chunking under a token budget (the packing step
    between cleaning and tokenization; complements q_llm_chunk's
    char-window split): split into sentences, count whitespace
    tokens, greedy-pack consecutive sentences into ~40-token chunks
    via a per-doc running sum (chunk = floor(preceding-tokens /
    budget) — deterministic, no sequential loop, a single doc_id
    shuffle shared by the window and the chunk aggregate).  A chunk
    can exceed the budget only when one sentence alone does —
    standard greedy semantics."""
    from pyspark.sql.window import Window

    s = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split("text", r"\. ")).alias("pos0", "sent"),
        )
        .where(F.col("sent") != "")
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "sent",
            F.size(F.split("sent", " ")).alias("tok"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = s.withColumn("cum", F.sum("tok").over(w))
    chunk_id = F.floor((F.col("cum") - F.col("tok")).cast("double") / 40).cast(
        "bigint"
    )
    return (
        c.withColumn("chunk_id", chunk_id)
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_sent"),
            F.sum("tok").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                        lambda x: x["sent"],
                    ),
                    ". ",
                )
            ).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "q_multimodal_video",
    oracle="""
    SELECT doc_id,
           'avi' AS fmt, 8 AS w, 8 AS h,
           CAST(3 + doc_id % 5 AS BIGINT) AS n_frames,
           CAST(4.0 AS DOUBLE) AS fps,
           ROUND(CAST(3 + doc_id % 5 AS DOUBLE) / 4.0, 4) AS duration_sec,
           CAST(LEAST(CEIL(CAST(3 + doc_id % 5 AS DOUBLE) / 2), 3) AS BIGINT)
               AS n_sampled
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-column round trip, distributed (SURVEY §2.J multimodal
    row, video facet): each task synthesizes a deterministic
    MJPEG-in-AVI payload per document (encode_jpeg frames →
    encode_avi_mjpeg container), then the SAME task parses it back
    (probe_video) and samples frames byte-exact (sample_avi_frames) —
    writer→parser consistency and the sampling contract checked by
    the oracle's arithmetic restatement of the expected container
    facts.  Pixel-level decode correctness is unit-pinned
    (tests/test_avi.py: sampled chunks decode via the JPEG codec).
    The Spark shape is the real one: payload construction and parsing
    never leave the executor; only small typed facts shuffle."""
    from clickhub_spark.operators.jpeg import encode_jpeg
    from clickhub_spark.operators.multimodal import (
        encode_avi_mjpeg,
        probe_video,
        sample_avi_frames,
    )

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)

    def run(batches):
        px = bytes(((x * 5 + y * 7 + c) % 256) for y in range(8) for x in range(8) for c in range(3))
        frame = encode_jpeg(8, 8, 3, px, quality=85)
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "fmt", "w", "h", "n_frames", "fps", "duration_sec", "n_sampled")}
            for did in pdf["doc_id"]:
                n = 3 + int(did) % 5
                avi = encode_avi_mjpeg(8, 8, [frame] * n, fps=4)
                fmt, w, h, nf, fps = probe_video(avi)
                sampled = sample_avi_frames(avi, every_nth=2, max_frames=3)
                rows["doc_id"].append(int(did))
                rows["fmt"].append(fmt)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["n_frames"].append(nf)
                rows["fps"].append(fps)
                rows["duration_sec"].append(round(nf / fps, 4))
                rows["n_sampled"].append(len(sampled))
            yield pd.DataFrame(rows)

    out = docs.select("doc_id").mapInPandas(
        run,
        "doc_id long, fmt string, w int, h int, n_frames long, fps double, "
        "duration_sec double, n_sampled long",
    )
    return out.orderBy("doc_id")


#: DuckDB transcription of the BPE merge loop (VERDICT r12 item 4 —
#: the merge table is deterministic, so the oracle replays Sennrich's
#: algorithm as a recursive CTE): level 0 is the capped word-frequency
#: table segmented into chars + </w>; each level counts adjacent
#: symbol pairs (overlapping, freq-weighted — one unnested row per
#: occurrence), picks the global argmax (count DESC, then (l, r)
#: lexicographic = train_bpe's tie-break), and re-segments every word
#: with the double-space replace trick, which reproduces the
#: left-to-right non-overlapping merge of _merge_once exactly
#: ('a a a a' + (a,a) → 'aa aa', not 'aa a a').  Recursion stops when
#: the GLOBAL best count drops below 2 (the trainer's stop rule) or
#: at 20 merges.
_BPE_TRAIN_ORACLE = r"""
WITH RECURSIVE words AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
        FROM documents
    ) WHERE word <> ''
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 5000
), state AS (
    SELECT 0 AS it, word, freq,
           array_to_string(
               [word[i] for i in generate_series(1, length(word))], ' '
           ) || ' </w>' AS seg,
           CAST(NULL AS VARCHAR) AS bl, CAST(NULL AS VARCHAR) AS br
    FROM words
    UNION ALL
    SELECT it + 1 AS it, word, freq,
           trim(replace(replace(' ' || replace(seg, ' ', '  ') || ' ',
                                ' ' || bl || '  ' || br || ' ',
                                ' ' || bl || br || ' '),
                        '  ', ' ')) AS seg,
           bl, br
    FROM (
        SELECT it, word, freq, seg,
               FIRST_VALUE(l) OVER w AS bl,
               FIRST_VALUE(r) OVER w AS br,
               FIRST_VALUE(cnt) OVER w AS gcnt,
               ROW_NUMBER() OVER (
                   PARTITION BY word ORDER BY cnt DESC, l, r
               ) AS rn
        FROM (
            SELECT it, word, freq, seg, l, r,
                   SUM(freq) OVER (PARTITION BY l, r) AS cnt
            FROM (
                SELECT it, word, freq, seg,
                       unnest([ [s[i], s[i+1]]
                                for i in generate_series(1, len(s)-1) ]) AS p
                FROM (SELECT it, word, freq, seg,
                             string_split(seg, ' ') AS s
                      FROM state WHERE it < 20)
            ) t0, LATERAL (SELECT p[1] AS l, p[2] AS r) t1
        ) t2
        WINDOW w AS (ORDER BY cnt DESC, l, r)
    ) t3
    WHERE rn = 1 AND gcnt >= 2
)
SELECT CAST(it - 1 AS INT) AS rank,
       MIN(bl) AS left, MIN(br) AS right, MIN(bl || br) AS merged
FROM state WHERE it >= 1
GROUP BY it
ORDER BY rank
"""


@query("q_llm_bpe_train", oracle=_BPE_TRAIN_ORACLE)
def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE tokenizer training (Sennrich 2016; SURVEY §2.J7
    tokenization family — complements q_llm_token_bpe, which applies
    a fixed regex): learn 20 merges from the documents corpus via
    operators/bpe.py — word-frequency table once (the 100 TB move:
    distinct words are bounded and heavy-tailed, capped at the
    most-frequent 5k; the only corpus-sized stage), then the merge
    loop runs driver-side over that bounded table with incremental
    pair-count updates (one Spark job total; the r5 per-round-job
    loop paid 6.7 s of scheduler overhead for milliseconds of merge
    math — the distributed loop remains for caps beyond driver
    memory).  Deterministic ties (count DESC, pair lexicographic)
    make the merge list reproducible across runs, partitionings, and
    tiers.  Returns (rank, left, right, merged)."""
    from clickhub_spark.operators.bpe import train_bpe

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=20, max_words=5000)
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    ).orderBy("rank")


@query(
    "q_llm_dedup_editdist",
    oracle="""
    WITH d AS (
        SELECT doc_id, text, length(text) AS n,
               substr(text, 1, 12) AS blk
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
    FROM d a JOIN d b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
     AND abs(a.n - b.n) <= 20
    WHERE levenshtein(a.text, b.text) <= 40
    ORDER BY id_a, id_b
    """,
)
def q_llm_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection (SURVEY §2.J5 family — the
    character-level complement to shingle/MinHash similarity): block
    on a 12-char prefix + length band (the classic blocking that
    turns O(n²) into per-block pairs), then verify candidates with
    exact Levenshtein ≤ 40.  Both engines implement standard
    Levenshtein (JVM builtin — no UDF).  At 100 TB the prefix block
    is the shuffle key; quadratic cost is confined within blocks and
    the length band prunes before the O(len²) distance runs."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        F.substring("text", 1, 12).alias("blk"),
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("ta"),
        F.col("n").alias("na"),
        "blk",
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("text").alias("tb"),
        F.col("n").alias("nb"),
        "blk",
    )
    pairs = (
        a.join(b, "blk")
        .where((F.col("id_a") < F.col("id_b")) & (F.abs(F.col("na") - F.col("nb")) <= 20))
        # r16 (guide §1.2 per-task work): pass the 40 cutoff INTO
        # levenshtein — Spark's threshold form runs the banded DP
        # (O(len·k) and early-exits) instead of the full O(len²)
        # matrix, returning -1 above the cutoff.  For kept rows the
        # value is the exact distance, so `dist != -1` ≡ the old
        # `dist <= 40` filter row-for-row (oracle unchanged).
        .withColumn("edit_dist", F.levenshtein("ta", "tb", 40).cast("bigint"))
        .where(F.col("edit_dist") != -1)
    )
    return pairs.select("id_a", "id_b", "edit_dist").orderBy("id_a", "id_b")


@query(
    "q_llm_quality_classifier",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) / 1000 AS f_len,
               CAST(len(string_split(text, ' ')) AS DOUBLE) / 100 AS f_words,
               CAST(length(text) - length(replace(text, '.', '')) AS DOUBLE)
                 / (len(string_split(text, ' ')) + 1) AS f_punct,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS f_en
        FROM documents
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-(-0.5 + 0.8 * f_len + 0.6 * f_words
                                    - 2.0 * f_punct + 0.4 * f_en))), 6)
               AS quality_score
    FROM f ORDER BY doc_id
    """,
)
def q_llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier scoring (the fasttext-classifier
    shape of CCNet/LLaMA data pipelines, with fixed published-style
    weights — SURVEY §2.J7 family; complements the rule-based
    q_llm_quality/quality_v2): handcrafted features (length, word
    count, period density, language flag) through a sigmoid, all
    JVM-side expression math — map-only, no UDF, the shape of any
    broadcast-weights linear scorer at 100 TB."""
    f_len = F.length("text").cast("double") / 1000
    f_words = F.size(F.split(F.col("text"), " ")).cast("double") / 100
    f_punct = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("."), F.lit("")))).cast("double")
        / (F.size(F.split(F.col("text"), " ")) + 1)
    )
    f_en = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    z = -0.5 + 0.8 * f_len + 0.6 * f_words - 2.0 * f_punct + 0.4 * f_en
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.round(1.0 / (1.0 + F.exp(-z)), 6).alias("quality_score"))
        .orderBy("doc_id")
    )


@query(
    "q_sort_nulls",
    oracle="""
    SELECT event_id, value
    FROM events WHERE event_id < 2000
    ORDER BY value DESC NULLS LAST, event_id
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering (ClickHouse ORDER BY ... DESC
    NULLS LAST — SURVEY §2.F family): null placement DIFFERS between
    engines' defaults (Spark: nulls first on ASC/last on DESC; DuckDB:
    nulls last always), so portable sorts must pin it.  The driver
    compare is order-insensitive; the parity being checked is that
    explicit placement yields the same ROW SET under LIMIT-free
    output and the same semantics documented for users."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") < 2000)
        .select("event_id", "value")
        .orderBy(F.col("value").desc_nulls_last(), "event_id")
    )


@query(
    "q_llm_kmeans_update",
    oracle="""
    WITH cent AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        FROM embeddings WHERE vec_id < 8
    ), scored AS (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cid,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS sim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, v, cid, sim,
               row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        FROM scored
    ), members AS (
        SELECT cid, v FROM assigned WHERE rn = 1
    ), dims AS (
        SELECT cid, d.i AS dim, AVG(v[d.i]) AS mu, COUNT(*) AS n
        FROM members, UNNEST(range(1, 65)) d(i)
        GROUP BY cid, d.i
    )
    SELECT CAST(cid AS BIGINT) AS cluster,
           CAST(MAX(n) AS BIGINT) AS n_members,
           ROUND(SUM(mu * mu), 4) AS centroid_sq_norm,
           ROUND(SUM(mu), 4) AS centroid_sum
    FROM dims GROUP BY cid ORDER BY cluster
    """,
)
def q_llm_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means centroid UPDATE step (the M-step completing
    q_llm_kmeans_assign's E-step — together one full distributed
    Lloyd iteration, the loop that builds every IVF coarse
    quantizer): assign each vector map-side to its nearest fixed
    centroid (broadcast literals, no shuffle), then re-average
    members per cluster via a per-dimension partial aggregate:
    posexplode the 64 dims map-side and hash-aggregate (cluster, dim)
    sums — partial aggregation means the shuffle carries at most
    k x 64 partial sums per partition, never the member vectors.
    Exported
    as per-cluster summary scalars (sq-norm / sum of the new
    centroid) so the oracle is engine-stable."""
    from clickhub_spark.functions.vectors import as_double, nearest_centroid

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cent_rows = sorted(
        emb.where(F.col("vec_id") < 8).collect(), key=lambda r: r["vec_id"]
    )
    cent = [(int(r["vec_id"]), list(r["v"])) for r in cent_rows]
    # cosine is scale-invariant: score the RAW vectors once
    # (pre_normalized=False folds the row norm inside the scorer) —
    # no separate normalize pass
    assigned = emb.withColumn(
        "cluster", nearest_centroid(F.col("v"), cent, pre_normalized=False)["cluster"]
    )
    # per-dimension partial sums: the shuffle after the explode
    # carries k x 64 partials per partition (map-side combine), never
    # the member vectors themselves
    dims = assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
    per = dims.groupBy("cluster", "dim").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mu = F.col("s") / F.col("n")
    return (
        per.groupBy("cluster")
        .agg(
            F.max("n").alias("n_members"),
            F.round(F.sum(mu * mu), 4).alias("centroid_sq_norm"),
            F.round(F.sum(mu), 4).alias("centroid_sum"),
        )
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            "n_members",
            "centroid_sq_norm",
            "centroid_sum",
        )
        .orderBy("cluster")
    )


@query(
    "q_llm_embed_matryoshka",
    oracle="""
    WITH t AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), c AS (
        SELECT vec_id, v, v[1:16] AS t16 FROM t
    ), n AS (
        SELECT vec_id,
               sqrt(list_sum(list_transform(t16, x -> x * x))) AS tn,
               list_cosine_similarity(v, list_concat(t16,
                   [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])) AS cos_keep
        FROM c
    )
    SELECT vec_id,
           ROUND(tn, 4) AS trunc_norm,
           ROUND(cos_keep, 4) AS cos_vs_full
    FROM n WHERE tn > 0 ORDER BY vec_id
    """,
)
def q_llm_embed_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style embedding truncation (Kusupati et al. 2022,
    arXiv:2205.13147 — SURVEY §2.J6 family; the cheap-tier trick MRL
    embeddings enable: keep the first k dims, renormalize, search in
    k-dim space): truncate 64→16, report the truncated norm and the
    cosine between the full vector and its zero-padded truncation
    (= the retained-energy fraction that decides whether the cheap
    tier is usable).  Pure array expression math, map-only."""
    t = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    t16 = F.slice(F.col("v"), 1, 16)
    dot16 = F.aggregate(
        F.zip_with(t16, t16, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    tn = F.sqrt(dot16)
    full_sq = F.aggregate(
        F.zip_with(F.col("v"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    # cos(v, pad(t16)) = |t16|^2 / (|v| * |t16|) = |t16| / |v|
    cos_keep = dot16 / (F.sqrt(full_sq) * tn)
    # filter on the UNROUNDED norm — the oracle's WHERE tn > 0 keeps
    # rows whose rounded norm is 0.0000, so rounding first would drop
    # them on the Spark side only
    return (
        t.where(tn > 0)
        .select(
            "vec_id",
            F.round(tn, 4).alias("trunc_norm"),
            F.round(cos_keep, 4).alias("cos_vs_full"),
        )
        .orderBy("vec_id")
    )


@query(
    "q_agg_auc",
    oracle="""
    WITH s AS (
        SELECT source,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               CAST(n_chars AS DOUBLE) AS score,
               doc_id
        FROM documents
    ), r AS (
        SELECT source, y, score,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score, doc_id) AS rn
        FROM s
    ), t AS (
        SELECT source, y, AVG(rn) OVER (PARTITION BY source, score) AS arank
        FROM r
    ), agg AS (
        SELECT source,
               SUM(CASE WHEN y = 1 THEN arank ELSE 0 END) AS rank_sum,
               SUM(y) AS n_pos, COUNT(*) - SUM(y) AS n_neg
        FROM t GROUP BY source
    )
    SELECT source,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           ROUND((rank_sum - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg), 6) AS auc
    FROM agg WHERE n_pos > 0 AND n_neg > 0 ORDER BY source
    """,
)
def q_agg_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ROC-AUC per group (ClickHouse arrayAUC — SURVEY
    §2.D ML-eval family; the quality-classifier evaluation step of a
    data pipeline): Mann-Whitney formulation with PROPER tie handling
    — row_number over (score, id), tie groups averaged to midranks,
    then AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻).  Two windows and
    the final aggregate all share ONE source-keyed shuffle; no
    pairwise positive×negative comparison (the O(n²) naive form)."""
    from pyspark.sql.window import Window

    s = load(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.col("n_chars").cast("double").alias("score"),
        "doc_id",
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("score", "doc_id")
    )
    arank = F.avg("rn").over(Window.partitionBy("source", "score"))
    t = s.withColumn("rn", rn).withColumn("arank", arank)
    agg = t.groupBy("source").agg(
        F.sum(F.when(F.col("y") == 1, F.col("arank")).otherwise(0.0)).alias(
            "rank_sum"
        ),
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
    )
    return (
        agg.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "source",
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            F.round(
                (F.col("rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
                / (F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )
        .orderBy("source")
    )


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT event_id, event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
               CAST(FLOOR(epoch(ts)) AS BIGINT)
                 + CAST(FLOOR(value * 10) AS BIGINT) AS e
        FROM events WHERE value > 0 AND user_id < 20
    ), a AS (SELECT * FROM iv WHERE event_type = 'click'),
       b AS (SELECT * FROM iv WHERE event_type = 'view')
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT)
               AS overlap_sec
    FROM a JOIN b ON a.s < b.e AND b.s < a.e
    ORDER BY id_a, id_b
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (SURVEY §2.C7 completion —
    point-in-interval was covered; this is the two-interval case,
    e.g. concurrent-session attribution): binned equi-join with the
    owner-bin trick — each overlapping pair is attributed to the bin
    holding the overlap's START, so no post-join distinct and no
    second shuffle (operators/rangejoin.interval_overlap_join).  The
    oracle is the plain theta join, which only an oracle can afford —
    Spark would plan it as a nested loop."""
    from clickhub_spark.operators.rangejoin import interval_overlap_join

    ev = load(spark, sf_dir, "events").where(
        (F.col("value") > 0) & (F.col("user_id") < 20)
    )
    iv = ev.select(
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.floor(F.col("value") * 10).cast("bigint")).alias(
            "e"
        ),
    )
    a = iv.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("id_a"), F.col("s").alias("sa"), F.col("e").alias("ea")
    )
    b = iv.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("id_b"), F.col("s").alias("sb"), F.col("e").alias("eb")
    )
    pairs = interval_overlap_join(a, b, "sa", "ea", "sb", "eb", bin_width=3600)
    return pairs.select(
        "id_a",
        "id_b",
        (F.least("ea", "eb") - F.greatest("sa", "sb")).cast("bigint").alias(
            "overlap_sec"
        ),
    ).orderBy("id_a", "id_b")


@query(
    "q_agg_ndcg",
    oracle="""
    WITH r AS (
        SELECT source,
               CASE WHEN lang = 'en' THEN 2
                    WHEN lang = 'de' THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS pos
        FROM documents
    ), k AS (
        SELECT source, rel, pos FROM r WHERE pos <= 10
    ), dcg AS (
        SELECT source,
               SUM((POWER(2, rel) - 1) / LN(pos + 1)) AS dcg
        FROM k GROUP BY source
    ), ideal AS (
        SELECT source,
               SUM((POWER(2, rel) - 1) / LN(ipos + 1)) AS idcg
        FROM (
            SELECT source, rel,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY rel DESC, doc_id) AS ipos
            FROM (
                SELECT source, doc_id,
                       CASE WHEN lang = 'en' THEN 2
                            WHEN lang = 'de' THEN 1 ELSE 0 END AS rel
                FROM documents
            )
        ) WHERE ipos <= 10 GROUP BY source
    )
    SELECT d.source, ROUND(d.dcg / i.idcg, 6) AS ndcg_at_10
    FROM dcg d JOIN ideal i USING (source)
    WHERE i.idcg > 0 ORDER BY source
    """,
)
def q_agg_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per group (ranking-quality evaluation — SURVEY §2.D
    ML-eval family, alongside q_agg_auc): documents ranked by a score
    (n_chars) against graded relevance (language tiers), gain
    (2^rel−1)/ln(pos+1), normalized by the ideal ordering's DCG.
    Both the actual and ideal rankings are top-10 windows over the
    SAME source-keyed shuffle; the two tiny per-group DCG aggregates
    join at k rows per group.  (ln, not log2, pinned on both sides —
    the normalization cancels the base anyway.)"""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    rel = (
        F.when(F.col("lang") == "en", 2)
        .when(F.col("lang") == "de", 1)
        .otherwise(0)
    )
    pos = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    )
    ipos = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("rel").desc(), "doc_id")
    )
    gain = lambda p: (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log(p + 1)  # noqa: E731
    base = docs.select("source", "doc_id", "n_chars", rel.alias("rel"))
    dcg = (
        base.withColumn("pos", pos)
        .where(F.col("pos") <= 10)
        .groupBy("source")
        .agg(F.sum(gain(F.col("pos"))).alias("dcg"))
    )
    idcg = (
        base.withColumn("ipos", ipos)
        .where(F.col("ipos") <= 10)
        .groupBy("source")
        .agg(F.sum(gain(F.col("ipos"))).alias("idcg"))
    )
    return (
        dcg.join(idcg, "source")
        .where(F.col("idcg") > 0)
        .select("source", F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"))
        .orderBy("source")
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_id, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT DISTINCT event_id FROM events WHERE event_id < 5000
    ) GROUP BY event_id HAVING count(*) = 1 ORDER BY event_id
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch canon of streaming exactly-once dedup
    (streaming/mv.stream_dedup — dropDuplicatesWithinWatermark, the
    Spark-native answer to at-least-once upstream delivery, SURVEY
    §2.I4): after the watermark closes, each key appears ONCE; the
    batch equivalent is DISTINCT on the key.  The streaming operator
    itself is exercised in tests/test_streaming (state bounded by the
    watermark delay, not the stream length — the 100 TB property)."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") < 5000)
        .select("event_id")
        .distinct()
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == 1)
        .orderBy("event_id")
    )


@query(
    "q_llm_boilerplate",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
        WHERE len(ws) >= 3
    ), freq AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(DISTINCT doc_id) >= 5
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(f.shingle) AS BIGINT) AS n_boiler,
           ROUND(CAST(COUNT(f.shingle) AS DOUBLE) / COUNT(*), 4)
               AS boiler_ratio
    FROM sh s LEFT JOIN freq f USING (shingle)
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
)
def q_llm_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection (the CCNet/RefinedWeb dedup-
    adjacent cleaning pass — SURVEY §2.J7 family): n-grams whose
    document frequency crosses a threshold are template text (site
    chrome, license headers, navigation), and each document reports
    its boilerplate fraction — the filter signal.  Plan shape: the
    frequent-shingle table is produced by one (shingle → distinct-doc
    count) aggregate and is SMALL by construction (heavy-tail cut),
    so it broadcast-joins back onto the per-doc shingle stream; the
    doc-level aggregate reuses the doc_id shuffle."""
    from clickhub_spark.operators.dedup import shingles

    sh = shingles(load(spark, sf_dir, "documents"), "text", "doc_id", 3)
    freq = (
        sh.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= 5)
        .select("shingle", F.lit(1).alias("__boiler"))
    )
    return (
        sh.join(F.broadcast(freq), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__boiler").alias("n_boiler"),
            F.round(
                F.count("__boiler").cast("double") / F.count(F.lit(1)), 4
            ).alias("boiler_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_scan_schema_evolution",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS channel
        FROM orders WHERE o_orderkey % 2 = 0
    ), v2 AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END AS channel
        FROM orders WHERE o_orderkey % 2 = 1
    ), u AS (
        SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT COALESCE(channel, '<pre-schema>') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM u GROUP BY 1 ORDER BY 1
    """,
)
def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan (SURVEY §2.A2 extension — the ALTER TABLE
    ADD COLUMN reality of any long-lived table): two parquet batches
    written at different schema versions (v2 adds ``channel``) read as
    ONE table via ``mergeSchema``; rows from the old batch surface the
    new column as NULL, exactly ClickHouse's added-column default
    semantics.  The batches are a fingerprint-cached build-once
    artifact (atomic publish); at 100 TB mergeSchema costs one footer
    read per FILE at planning — the data itself is never rewritten,
    which is the entire point versus a backfill."""
    from clickhub_spark.artifacts import build_artifact

    orders = load(spark, sf_dir, "orders")

    def write(build: str) -> None:
        v1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        )
        v2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            "o_totalprice",
            F.when(F.col("o_orderkey") % 3 == 0, "web")
            .otherwise("store")
            .alias("channel"),
        )
        v1.write.mode("overwrite").parquet(build + "/batch=v1")
        v2.write.mode("overwrite").parquet(build + "/batch=v2")

    path = build_artifact(orders, "schema_evolution", write)
    u = spark.read.option("mergeSchema", "true").parquet(
        path + "/batch=v1", path + "/batch=v2"
    )
    return (
        u.groupBy(F.coalesce(F.col("channel"), F.lit("<pre-schema>")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("channel")
    )


@query(
    "q_scan_time_travel",
    oracle="""
    WITH v0 AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 0
    ), v1 AS (
        SELECT * FROM v0 WHERE o_totalprice >= 50000
    ), v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS o_totalprice
        FROM v1
    )
    SELECT * FROM (
        SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total FROM v0
        UNION ALL
        SELECT 1, CAST(COUNT(*) AS BIGINT), ROUND(SUM(o_totalprice), 2) FROM v1
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT), ROUND(SUM(o_totalprice), 2) FROM v2
    ) ORDER BY version
    """,
)
def q_scan_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (operators/mutate snapshot layer — the
    lakehouse DELETE/UPDATE-with-history contract on plain dirs):
    v0 = initial publish, v1 = DELETE (cheap orders dropped), v2 =
    UPDATE (10% uplift on a key slice); all three versions stay
    readable AFTER the mutations because each publish is an immutable
    version dir + one atomic pointer flip.  The query reads every
    retained version and reports (n, total) per version; the oracle
    replays the same mutations relationally.  Versions live in a
    fingerprint-cached artifact, so re-runs see the same history."""
    from clickhub_spark.artifacts import build_artifact
    from clickhub_spark.operators.mutate import (
        read_snapshot,
        snapshot_mutate,
        snapshot_write,
    )

    orders = load(spark, sf_dir, "orders")

    def write(build: str) -> None:
        os.makedirs(build, exist_ok=True)
        v0 = orders.where(F.col("o_orderkey") % 4 == 0).select(
            "o_orderkey", "o_totalprice"
        )
        snapshot_write(v0, build)
        snapshot_mutate(
            spark, build, lambda df: df.where(F.col("o_totalprice") >= 50_000)
        )
        snapshot_mutate(
            spark,
            build,
            lambda df: df.withColumn(
                "o_totalprice",
                F.when(
                    F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
                ).otherwise(F.col("o_totalprice")),
            ),
        )

    table = build_artifact(orders, "time_travel", write)
    per_version = [
        read_snapshot(spark, table, v)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(F.lit(v).alias("version"), "n", "total")
        for v in (0, 1, 2)
    ]
    out = per_version[0]
    for p in per_version[1:]:
        out = out.unionByName(p)
    return out.orderBy("version")


@query(
    "q_scan_snapshot_diff",
    oracle="""
    WITH v0 AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 0
    ), v1 AS (
        SELECT * FROM v0 WHERE o_totalprice >= 50000
    ), v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS o_totalprice
        FROM v1
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT a.o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'delete'
                    WHEN a.o_totalprice <> b.o_totalprice THEN 'update'
               END AS change_type
        FROM v0 a LEFT JOIN v2 b USING (o_orderkey)
    ) WHERE change_type IS NOT NULL
    GROUP BY change_type ORDER BY change_type
    """,
)
def q_scan_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between snapshot versions (operators/mutate.snapshot_diff —
    the changefeed an incremental consumer replays instead of
    re-scanning the table): diff v0→v2 of the time-travel table
    classifies every changed key as insert/delete/update via one
    full-outer join on the key with struct-compared values.  The
    oracle replays the same mutations relationally and counts per
    change type (this history has deletes + updates, no inserts)."""
    from clickhub_spark.artifacts import derived_artifact_path
    from clickhub_spark.operators.mutate import snapshot_diff

    orders = load(spark, sf_dir, "orders")
    # reuse q_scan_time_travel's fingerprint-cached history (same
    # inputs + tag -> same artifact); building it is idempotent
    q_scan_time_travel(spark, sf_dir).collect()
    table = derived_artifact_path(orders, "time_travel")
    diff = snapshot_diff(spark, table, 0, 2, keys=["o_orderkey"])
    return (
        diff.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change_type")
    )


@query(
    "q_agg_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort,
               CAST(FLOOR(date_diff('day', f.cohort,
                                    date_trunc('week', e.ts)) / 7.0) AS BIGINT)
                   AS week_off
        FROM events e JOIN firsts f USING (user_id)
    ), sizes AS (
        SELECT cohort, COUNT(*) AS cohort_n FROM firsts GROUP BY cohort
    )
    SELECT CAST(a.cohort AS TIMESTAMP) AS cohort, a.week_off,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           ROUND(CAST(COUNT(*) AS DOUBLE) / s.cohort_n, 4) AS retention
    FROM activity a JOIN sizes s USING (cohort)
    WHERE a.week_off <= 6
    GROUP BY a.cohort, a.week_off, s.cohort_n
    ORDER BY cohort, week_off
    """,
)
def q_agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (the product-analytics staple beyond
    the simple retention() aggregate — SURVEY §2.D/CH family): users
    cohorted by first-activity week; each cell = fraction of the
    cohort active in week-offset N.  Plan: ONE user_id shuffle
    produces first-activity weeks; the activity join is user-keyed on
    the same distribution; cohort sizes are a tiny broadcast-back
    table.  The matrix is |cohorts|×|offsets| — always small output
    from any input volume."""
    firsts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    )
    activity = (
        load(spark, sf_dir, "events")
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7.0
            )
            .cast("bigint")
            .alias("week_off"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_n"))
    return (
        activity.where(F.col("week_off") <= 6)
        .groupBy("cohort", "week_off")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_off",
            "active_users",
            F.round(F.col("active_users").cast("double") / F.col("cohort_n"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort", "week_off")
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT c.ts FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click'
             ORDER BY abs(epoch(c.ts) - epoch(e.ts)),
                      CASE WHEN c.ts <= e.ts THEN 0 ELSE 1 END
             LIMIT 1) AS asof_ts
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest' parity — SURVEY §2.C8 completion alongside
    backward/forward): for each error event, the click by the same
    user CLOSEST in time, ties preferring the at-or-before match.
    Both direction passes share one union + one partitioning — no
    second shuffle (operators/asof._asof_nearest).  The oracle is a
    correlated nearest-row subquery with the same tie rule."""
    from clickhub_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(
        errors,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=[],
        direction="nearest",
    ).select("event_id", "user_id", "ts", "asof_ts")


@query(
    "q_win_running_distinct",
    oracle="""
    SELECT event_id, event_type, ts,
           COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS distinct_users_so_far
    FROM events WHERE event_id < 3000
    ORDER BY event_type, ts, event_id
    """,
)
def q_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — a aggregate Spark's
    window functions REFUSE (DISTINCT is unsupported in window
    aggregates), emulated scalably with the first-occurrence-marker
    trick: row_number over (group, user) in time order marks each
    user's first event (1 shuffle), and a running SUM of markers over
    the time order (same group partitioning) IS the running distinct
    count.  The oracle is DuckDB's native COUNT(DISTINCT) OVER —
    checking the emulation against the real semantics.  At 100 TB
    this is two windows on one group-keyed distribution; the naive
    set-per-row form would be O(n²) memory."""
    from pyspark.sql.window import Window

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") < 3000)
        .select("event_id", "event_type", "user_id", "ts")
    )
    first_seen = F.row_number().over(
        Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    )
    marked = ev.withColumn("__new_user", F.when(first_seen == 1, 1).otherwise(0))
    running = F.sum("__new_user").over(
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return marked.select(
        "event_id",
        "event_type",
        "ts",
        running.alias("distinct_users_so_far"),
    ).orderBy("event_type", "ts", "event_id")


@query(
    "q_seq_match_time",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'purchase')
    ), nxt AS (
        SELECT user_id, event_type, ts,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ts) OVER w AS next_ts
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_matched,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM nxt
    WHERE event_type = 'view' AND next_type = 'purchase'
      AND epoch(next_ts) - epoch(ts) < 3600
    """,
)
def q_seq_match_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch with a TIME CONSTRAINT (ClickHouse
    ``sequenceMatch('(?1)(?t<3600)(?2)')`` — SURVEY §2.CH funnel
    family beyond plain pattern order): users with a view IMMEDIATELY
    followed (among the filtered event set) by a purchase within one
    hour.  One user_id shuffle; the adjacency is a lead() pair scan —
    no self-join, no per-user event-string materialization (the
    regexp form's memory cost at long histories)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    nxt = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    hits = nxt.where(
        (F.col("event_type") == "view")
        & (F.col("next_type") == "purchase")
        & (F.unix_timestamp("next_ts") - F.unix_timestamp("ts") < 3600)
    )
    return hits.agg(
        F.count_distinct("user_id").alias("n_users_matched"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


@query(
    "q_fn_minmax_normalize",
    oracle="""
    WITH s AS (
        SELECT event_id, event_type, value,
               MIN(value) OVER (PARTITION BY event_type) AS lo,
               MAX(value) OVER (PARTITION BY event_type) AS hi
        FROM events WHERE value IS NOT NULL AND event_id < 5000
    )
    SELECT event_id, event_type,
           ROUND(CASE WHEN hi = lo THEN 0.5
                      ELSE (value - lo) / (hi - lo) END, 6) AS value_norm
    FROM s ORDER BY event_id
    """,
)
def q_fn_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling (the normalization step
    before score mixing / model input — SURVEY §2.H/J7 utility):
    (x−min)/(max−min) per event_type with the degenerate
    constant-group case pinned to 0.5.  One group shuffle; the
    min/max windows and the projection share it."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type")
    s = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & (F.col("event_id") < 5000))
        .select(
            "event_id",
            "event_type",
            "value",
            F.min("value").over(w).alias("lo"),
            F.max("value").over(w).alias("hi"),
        )
    )
    norm = F.when(F.col("hi") == F.col("lo"), 0.5).otherwise(
        (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    return s.select(
        "event_id", "event_type", F.round(norm, 6).alias("value_norm")
    ).orderBy("event_id")


@query(
    "q_agg_mode",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), r AS (
        SELECT o_orderpriority, o_orderstatus, cnt,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY cnt DESC, o_orderstatus) AS rn
        FROM c
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status,
           CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1 ORDER BY o_orderpriority
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value per group (ClickHouse topK(1)/anyHeavy exact form —
    SURVEY §2.D family): most frequent status per priority,
    DETERMINISTIC ties (count DESC, then value — engines' native
    mode() leaves ties unspecified, so both sides pin the same
    order).  Two partial-aggregated shuffles: (group, value) counts,
    then max_by per group — no window needed on the Spark side."""
    c = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # max_by over a sortable struct pins the tie order: higher count
    # wins; equal counts -> LOWEST status string wins (struct compares
    # -cnt would need numeric; use (cnt, negated-ordering) via
    # struct(cnt, reverse sort key)): simplest deterministic form is
    # struct(cnt DESC, status ASC) emulated by max_by on
    # struct(cnt, neg_rank_of_status). Strings lack negation, so use
    # min_by on struct(-cnt, status).
    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.min_by(
                F.struct(F.col("o_orderstatus"), F.col("cnt")),
                F.struct((-F.col("cnt")).alias("nc"), F.col("o_orderstatus")),
            ).alias("m")
        )
        .select(
            "o_orderpriority",
            F.col("m.o_orderstatus").alias("mode_status"),
            F.col("m.cnt").alias("mode_count"),
        )
        .orderBy("o_orderpriority")
    )


# ln(2) / (7 days in seconds): half-life decay constant, embedded as
# the SAME double literal on both engine sides so exp() receives
# identical operands (only libm-vs-Math.exp last-ulp noise remains,
# absorbed by the 4/6-dp rounding).
_DECAY_LAMBDA = 1.1460766874337719e-06


@query(
    "q_agg_time_decay",
    oracle=f"""
    WITH s AS (
        SELECT event_type, value, epoch(ts) AS t,
               MAX(epoch(ts)) OVER (PARTITION BY event_type) AS tmax
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           ROUND(SUM(value * EXP((t - tmax) * {_DECAY_LAMBDA!r})), 4)
               AS decayed_sum,
           ROUND(SUM(value * EXP((t - tmax) * {_DECAY_LAMBDA!r}))
                 / SUM(EXP((t - tmax) * {_DECAY_LAMBDA!r})), 6)
               AS decayed_avg
    FROM s GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decayed sum/avg per group (ClickHouse
    ``exponentialTimeDecayedSum/Avg`` — SURVEY §2.D stats family),
    7-day half-life anchored at each group's latest event.  The naive
    algebra sum(v*exp(t/l))*exp(-tmax/l) overflows for epoch-scale t,
    so the exponent is centred per group first: a window max over the
    event_type partition, then the aggregate — the groupBy reuses the
    window's hash partitioning, so ONE shuffle total.  Timestamps go
    through cast-to-double (microsecond fractions kept; Spark
    unix_timestamp would truncate and diverge from DuckDB epoch())."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type")
    s = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            F.col("ts").cast("double").alias("t"),
            F.max(F.col("ts").cast("double")).over(w).alias("tmax"),
        )
    )
    wgt = F.exp((F.col("t") - F.col("tmax")) * F.lit(_DECAY_LAMBDA))
    return (
        s.groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("value") * wgt), 4).alias("decayed_sum"),
            F.round(F.sum(F.col("value") * wgt) / F.sum(wgt), 6).alias(
                "decayed_avg"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "q_fn_round_modes",
    oracle="""
    WITH n AS (SELECT x AS n FROM generate_series(1, 1000) t(x)),
    v AS (
        SELECT n, (n - 500) / 2.0 AS half, (n - 500) / 4.0 AS q FROM n
    )
    SELECT n,
           round_even(half, 0) + 0.0 AS bankers0,
           ROUND(half, 0) + 0.0 AS round0,
           round_even(q, 1) + 0.0 AS bankers1,
           CAST(POWER(2, LENGTH(bin(n)) - 1) AS BIGINT) AS to_exp2
    FROM v ORDER BY n
    """,
)
def q_fn_round_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode surface (ClickHouse ``roundBankers`` /
    ``round`` / ``roundToExp2`` — SURVEY §2.G3): banker's
    half-to-even (Spark ``bround`` vs DuckDB ``round_even``),
    half-away-from-zero (both engines' ROUND on ties), and
    round-down-to-power-of-two.  Tie inputs are multiples of 0.25/0.5
    — binary-EXACT doubles, so both engines see true decimal halves
    (arbitrary doubles would hit the shortest-rendering-vs-binary
    ROUND divergence).  roundToExp2 uses integer bit-length
    (``length(bin(n))-1``), not floor(log2(n)) — float logs can land
    an ulp under an exact power and floor off by one between libms."""
    n = spark.range(1, 1001).select(F.col("id").alias("n"))
    v = n.select(
        "n",
        ((F.col("n") - 500) / 2.0).alias("half"),
        ((F.col("n") - 500) / 4.0).alias("q"),
    )
    # + 0.0 on every rounded output (both sides): IEEE -0.0 + 0.0 is
    # +0.0, normalizing DuckDB's sign-preserving round_even(-0.5) ->
    # -0.0 against BigDecimal's unsigned zero.
    return v.select(
        "n",
        (F.bround(F.col("half"), 0) + F.lit(0.0)).alias("bankers0"),
        (F.round(F.col("half"), 0) + F.lit(0.0)).alias("round0"),
        (F.bround(F.col("q"), 1) + F.lit(0.0)).alias("bankers1"),
        F.pow(F.lit(2), F.length(F.bin(F.col("n"))) - 1)
        .cast("long")
        .alias("to_exp2"),
    ).orderBy("n")


@query(
    "q_agg_ks_test",
    oracle="""
    WITH p AS (
        SELECT value,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
        FROM events
        WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ), c AS (
        SELECT SUM(g1) OVER (ORDER BY value
                             RANGE BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS c1,
               SUM(1 - g1) OVER (ORDER BY value
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS c2,
               SUM(g1) OVER () AS n1,
               SUM(1 - g1) OVER () AS n2
        FROM p
    )
    SELECT FLOOR(MAX(ABS(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                         - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                 * 1000000) / 1000000 AS ks_d,
           CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2
    FROM c
    """,
)
def q_agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (ClickHouse
    ``kolmogorovSmirnovTest`` — SURVEY §2.D stats family): max ECDF
    gap between 'view' and 'click' value distributions.  The oracle
    is the naive per-row RANGE-frame window form; the Spark plan is
    the per-VALUE-counts rewrite (VERDICT r5 item 2, the
    q_llm_score_normalize technique): a full-table
    ``Window.orderBy(value)`` plans Exchange SinglePartition — one
    task sorts every row — so instead the rows are aggregated to
    per-distinct-value (view, click) counts first (a parallel hash
    shuffle), the cumulative window runs over the distinct-value
    table only, and the scalar totals ride in on a single-row
    broadcast cross.  ECDFs are per-value-exact: within a tie group
    every row's RANGE-cumulative counts equal the tie group's
    closing counts, so max-over-values ≡ max-over-rows.  Both
    engines divide the same exact integer counts, so the doubles are
    bit-identical — FLOOR-scaling per the repo's same-IEEE-double
    convention, not ROUND."""
    from pyspark.sql.window import Window

    p = (
        load(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "click")
            & F.col("value").isNotNull()
        )
        .select(
            "value",
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g1"),
        )
    )
    counts = p.groupBy("value").agg(
        F.sum("g1").alias("d1"),
        F.sum(1 - F.col("g1")).alias("d2"),
    )
    # cumulative window over the DISTINCT-VALUE table only (bounded by
    # value cardinality, not row count) — whitelisted aggregated-input
    # form in tools/plan_guard.py
    wcum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = counts.select(
        F.sum("d1").over(wcum).alias("c1"),
        F.sum("d2").over(wcum).alias("c2"),
    )
    tot = counts.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    gap = F.abs(
        F.col("c1").cast("double") / F.col("n1").cast("double")
        - F.col("c2").cast("double") / F.col("n2").cast("double")
    )
    return c.crossJoin(F.broadcast(tot)).agg(
        (F.floor(F.max(gap) * 1000000) / 1000000).alias("ks_d"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )


@query(
    "q_agg_mannwhitney",
    oracle="""
    WITH p AS (
        SELECT value,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
        FROM events
        WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ), r AS (
        SELECT g1,
               RANK() OVER (ORDER BY value)
               + (COUNT(*) OVER (ORDER BY value
                                 RANGE BETWEEN CURRENT ROW
                                 AND CURRENT ROW) - 1) / 2.0 AS avg_rank
        FROM p
    ), s AS (
        SELECT CAST(SUM(CASE WHEN g1 = 1 THEN avg_rank END) AS DOUBLE)
                   AS r1,
               CAST(SUM(g1) AS BIGINT) AS n1,
               CAST(SUM(1 - g1) AS BIGINT) AS n2
        FROM r
    )
    SELECT r1 - n1 * (n1 + 1) / 2.0 AS u1,
           CAST(n1 AS DOUBLE) * n2 - (r1 - n1 * (n1 + 1) / 2.0) AS u2,
           n1, n2
    FROM s
    """,
)
def q_agg_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U statistic, two samples (ClickHouse
    ``mannWhitneyUTest`` — SURVEY §2.D stats family): rank-sum of the
    'view' sample over the pooled 'view'+'click' values with
    TIE-AVERAGED ranks (competition rank + (peers-1)/2, the textbook
    midrank), then U1 = R1 - n1(n1+1)/2 and U2 = n1*n2 - U1.
    The oracle is the naive per-row rank-window form; the Spark plan
    is the per-VALUE-counts rewrite (VERDICT r5 item 2): midranks
    are a function of per-value cumulative counts — midrank(v) =
    #strictly-smaller rows + (peers+1)/2 — so the rows aggregate to
    (value, d1, peers) first (parallel hash shuffle), the cumulative
    window runs over the distinct-value table only, and R1 =
    Σ d1(v)·midrank(v), never a full-table Exchange-SinglePartition
    sort.  Midranks are integers-or-halves and the sums stay far
    below 2^53, so every intermediate double is exact regardless of
    summation order — no rounding needed on either side."""
    from pyspark.sql.window import Window

    p = (
        load(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("view", "click")
            & F.col("value").isNotNull()
        )
        .select(
            "value",
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g1"),
        )
    )
    counts = p.groupBy("value").agg(
        F.sum("g1").alias("d1"),
        F.count(F.lit(1)).alias("peers"),
    )
    # strictly-smaller cumulative over the DISTINCT-VALUE table only —
    # whitelisted aggregated-input form in tools/plan_guard.py
    wprev = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    r = counts.select(
        "d1",
        "peers",
        (
            F.coalesce(F.sum("peers").over(wprev), F.lit(0))
            + (F.col("peers") + 1) / 2.0
        ).alias("midrank"),
    )
    s = r.agg(
        F.sum(F.col("d1") * F.col("midrank")).cast("double").alias("r1"),
        F.sum("d1").alias("n1"),
        F.sum(F.col("peers") - F.col("d1")).alias("n2"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    return s.select(
        u1.alias("u1"),
        (F.col("n1").cast("double") * F.col("n2") - u1).alias("u2"),
        "n1",
        "n2",
    )


@query(
    "q_agg_theils_u",
    oracle="""
    WITH o AS (
        SELECT event_type AS r, CAST(user_id % 3 AS BIGINT) AS c,
               CAST(count(*) AS DOUBLE) AS obs
        FROM events GROUP BY r, c
    ), w AS (
        SELECT obs, SUM(obs) OVER (PARTITION BY c) AS col_tot FROM o
    ), a AS (
        SELECT (SUM(obs * LN(col_tot)) - SUM(obs * LN(obs))) / SUM(obs)
                   AS h_rc
        FROM w
    ), rt AS (
        SELECT SUM(obs) AS row_tot FROM o GROUP BY r
    ), b AS (
        SELECT LN(SUM(row_tot)) - SUM(row_tot * LN(row_tot)) / SUM(row_tot)
                   AS h_r
        FROM rt
    )
    SELECT ROUND(b.h_r, 6) AS h_r,
           ROUND(a.h_rc, 6) AS h_rc,
           ROUND((b.h_r - a.h_rc) / b.h_r, 6) AS theils_u
    FROM a, b
    """,
)
def q_agg_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U uncertainty coefficient U(R|C) (ClickHouse
    ``theilsU`` — completes the §2.D13 association family next to
    chi2/cramersV in q_agg_contingency): how much knowing the user
    bucket C reduces entropy of the event type R, (H(R)-H(R|C))/H(R).
    Entropies use the algebra H = ln(n) - sum(k*ln k)/n so no
    per-cell probability division is needed; H(R|C) reduces to
    (sum(obs*ln col_tot) - sum(obs*ln obs))/n over the ~15-cell
    contingency table (one partial-aggregated fact shuffle; window +
    final aggs run on the tiny cell grid).  The two 1-row entropy
    frames meet in a broadcast scalar cross join."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("r"), (F.col("user_id") % 3).alias("c")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    wc = Window.partitionBy("c")
    w = cells.select("obs", F.sum("obs").over(wc).alias("col_tot"))
    a = w.agg(
        (
            (
                F.sum(F.col("obs") * F.log("col_tot"))
                - F.sum(F.col("obs") * F.log("obs"))
            )
            / F.sum("obs")
        ).alias("h_rc")
    )
    rt = cells.groupBy("r").agg(F.sum("obs").alias("row_tot"))
    b = rt.agg(
        (
            F.log(F.sum("row_tot"))
            - F.sum(F.col("row_tot") * F.log("row_tot")) / F.sum("row_tot")
        ).alias("h_r")
    )
    return a.crossJoin(F.broadcast(b)).select(
        F.round("h_r", 6).alias("h_r"),
        F.round("h_rc", 6).alias("h_rc"),
        F.round((F.col("h_r") - F.col("h_rc")) / F.col("h_r"), 6).alias(
            "theils_u"
        ),
    )
