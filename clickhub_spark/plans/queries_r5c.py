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
    spark.sql.python.filterPushdown.enabled is false.)"""
    register_sources(spark)
    n = (
        spark.read.format("engine_numbers")
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
    register_sources(spark)
    repo = _fixture_repo()
    df = (
        spark.read.format("gitlog")
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
    verified = candidates.join(
        history.select("text").distinct(), "text", "left_semi"
    )
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
    bench_sh = (
        shingles(docs.where(F.col("doc_id") % 50 == 0), "text", "doc_id", 3)
        .select("shingle")
        .distinct()
    )
    m_bits, k = 1 << 19, 6
    bitmap = bloom.build_bloom(
        bench_sh.select(F.xxhash64("shingle").alias("h")), "h", m_bits, k
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
