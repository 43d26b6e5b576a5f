"""Round-5 second batch: pivot/unpivot reshaping, batch
sessionization, runningDifference/neighbor, sequenceCount, map
functions, k-means assignment, int8 embedding quantization, dataset
cards, copy-on-write DELETE, the filesystem queue backend, and
bloom-skip-index point scans (SURVEY §2.F/G/H/I/J extensions).

Each query pairs a Spark builder with a DuckDB oracle (registry
contract); engine-internal state (artifact copies, queue dirs) is
driver-local and fingerprint-cached like q_scan_zorder /
q_join_bucketed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
           CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_medium,
           CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS n_notspec,
           CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS n_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT reshaping (SURVEY §2.F extension — ClickHouse expresses
    this as countIf columns, reference repo/query.py's per-status
    columns): order counts per status × priority.  Explicit pivot
    values mean NO value-discovery scan, and Spark compiles this to
    its two-level pivot aggregate: the heavy partial+final count on
    (status, priority) reduces the fact table first, then a tiny
    PivotFirst agg reshapes the pre-aggregated rows — the 100 TB
    form (plan-pinned: two Exchanges, no Expand)."""
    pv = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    aliases = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]
    return pv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
            for p, a in zip(_PRIORITIES, aliases)
        ],
    )


@query(
    "q_unpivot",
    oracle="""
    WITH u AS (
        SELECT p_brand, 'retailprice' AS metric, p_retailprice AS value FROM part
        UNION ALL
        SELECT p_brand, 'size', CAST(p_size AS DOUBLE) FROM part
    )
    SELECT p_brand, metric,
           ROUND(AVG(value), 4) AS avg_value,
           CAST(count(*) AS BIGINT) AS n
    FROM u GROUP BY p_brand, metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (SURVEY §2.F extension — the inverse reshaping;
    Spark's native ``DataFrame.unpivot``, Expand node in the plan):
    wide part metrics to long (metric, value) pairs, then re-aggregate.
    Expand emits both rows map-side in one pass over the scan — at
    100 TB this beats the UNION ALL double-scan the oracle states; the
    single shuffle is the re-aggregation."""
    p = load(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    long = p.unpivot(["p_brand"], ["retailprice", "size"], "metric", "value")
    return long.groupBy("p_brand", "metric").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS BIGINT)
               AS duration_sec
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 30-minute inactivity gap (SURVEY
    §2.I3's batch canon for session windows, lag+cumsum form — how a
    warehouse computes what ClickHouse does with
    windowFunnel/session_window): per-user event streams split where
    the gap exceeds the timeout, then per-session rollups.  One
    shuffle on user_id serves both window passes AND the final
    aggregate (same partitioning reused across stages); microsecond
    epochs keep the gap math exact on both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = load(spark, sf_dir, "events").withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        (
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("duration_sec"),
    )


@query(
    "q_win_neighbor",
    oracle="""
    SELECT user_id, event_id,
           ROUND(value - lag(value) OVER w, 4) AS delta_prev,
           ROUND(lead(value) OVER w - value, 4) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """runningDifference / neighbor analogs (ClickHouse
    runningDifference(value), neighbor(value, ±1) — SURVEY §2.H
    extension): per-user time-ordered deltas to the previous and next
    event.  ClickHouse's block-scoped versions are order-fragile;
    the window form is the deterministic distributed restatement —
    one shuffle on user_id, both lag and lead share the frame."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(v - F.lag(v).over(w), 4).alias("delta_prev"),
        F.round(F.lead(v).over(w) - v, 4).alias("delta_next"),
    )


@query(
    "q_seq_count",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INT) AS n_seq,
           CAST(length(seq) AS INT) AS n_events
    FROM seqs
    """,
)
def q_seq_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceCount analog (ClickHouse sequenceCount('(?1).*(?2)') —
    SURVEY §2.D extension next to q_seq_match): how many
    non-overlapping view→…→purchase chains each user completed.
    Same collapse-to-string shape as q_seq_match (one shuffle), then
    a regexp_count — left-to-right non-overlapping scan semantics are
    identical in Java and RE2-style engines for this pattern."""
    ev = load(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.col("event_type").substr(1, 1).alias("c"))
                    )
                ),
                lambda s: s["c"],
            ),
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.regexp_count("seq", F.lit("v[^p]*p")).cast("int").alias("n_seq"),
        F.length("seq").cast("int").alias("n_events"),
    )


@query(
    "q_fn_map",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS type_keys,
           string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY event_type)
               AS type_counts,
           CAST(coalesce(MAX(CASE WHEN event_type = 'click' THEN cnt END), 0)
                AS BIGINT) AS n_click,
           CAST(count(*) AS INT) AS n_types
    FROM c GROUP BY user_id
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family (ClickHouse Map type + mapKeys/mapValues/
    map[key] — SURVEY §2.G extension): per-user event-type count map
    built with map_from_entries, read back with map_keys/map_values/
    element_at.  The map is exported as key-sorted parallel CSV
    strings — the SCALAR wire form (map iteration order is engine-
    internal in both systems, and the correctness driver's pandas
    canonicalizer cannot sort array cells — the round-6 driver-red
    lesson).  Two hash aggregates, no Python."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.concat_ws(",", F.map_keys("m")).alias("type_keys"),
        F.concat_ws(
            ",", F.transform(F.map_values("m"), lambda v: v.cast("string"))
        ).alias("type_counts"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("n_click"),
        F.size("m").alias("n_types"),
    )


@query(
    "q_llm_kmeans_assign",
    oracle="""
    WITH cent AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        FROM embeddings WHERE vec_id < 8
    ), scored AS (
        SELECT e.vec_id, c.cid,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS sim
        FROM embeddings e CROSS JOIN cent c
    ), ranked AS (
        SELECT vec_id, cid, sim,
               row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        FROM scored
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster, ROUND(sim, 4) AS sim
    FROM ranked WHERE rn = 1
    """,
)
def q_llm_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment step over embeddings (SURVEY §2.J6 adjunct —
    the E-step every clustering/IVF-build pipeline runs): nearest of
    k=8 fixed centroids by cosine.  Centroids are a bounded PARAMETER
    table inlined into the plan as literals (functions/vectors.
    nearest_centroid — the IVF-centroid contract), so the whole step
    is MAP-ONLY: no join, no shuffle, one codegen'd k-way array
    expression per row.  Deterministic centroid choice (vec_id < 8)
    makes the step oracle-checkable; the full Lloyd loop is this step
    iterated with re-averaged centroids."""
    from clickhub_spark.functions.vectors import as_double, nearest_centroid, norm

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cent_rows = sorted(
        emb.where(F.col("vec_id") < 8).collect(), key=lambda r: r["vec_id"]
    )
    # normalize once per row (materialized — never inline the norm
    # into the transform lambda, that re-folds per element) so each
    # centroid score is a single dot-product fold
    nrm = emb.withColumn("n", F.nullif(norm(F.col("v")), F.lit(0.0))).withColumn(
        "nv", F.transform(F.col("v"), lambda x: x / F.col("n"))
    )
    best = nrm.withColumn(
        "b",
        nearest_centroid(
            F.col("nv"),
            [(r["vec_id"], r["v"]) for r in cent_rows],
            pre_normalized=True,
        ),
    )
    return best.select(
        "vec_id",
        F.col("b.cluster").alias("cluster"),
        F.round(F.col("b.sim"), 4).alias("sim"),
    )


@query(
    "q_llm_embed_quant",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ), s AS (
        SELECT vec_id, vec,
               list_max(list_transform(vec, x -> abs(x))) AS absmax
        FROM v
    )
    SELECT vec_id,
           ROUND(absmax, 6) AS scale_maxabs,
           CAST(CASE WHEN absmax = 0 THEN 0 ELSE
               list_sum(list_transform(vec, x -> round(x * 127.0 / absmax)))
           END AS BIGINT) AS q_checksum,
           ROUND(CASE WHEN absmax = 0 THEN 0.0 ELSE
               list_max(list_transform(
                   vec, x -> abs(x - round(x * 127.0 / absmax) * absmax / 127.0)))
           END, 6) AS max_err
    FROM s
    """,
)
def q_llm_embed_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization round trip (SURVEY §2.J6 storage
    tier; functions/vectors.quantize_int8): symmetric max-abs scale,
    per-vector quantized checksum, and the max reconstruction error
    after dequantize — the 4×-compression path a 100 TB embedding
    store serves ANN from.  Scale is materialized once per row (not
    inlined into the lambda — that would be O(dim²)); everything is
    codegen'd higher-order expressions, no Python."""
    from clickhub_spark.functions.vectors import (
        as_double,
        dequantize_int8,
        maxabs,
        quantize_int8,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    scaled = emb.withColumn("absmax", maxabs(F.col("vec")))
    q = scaled.withColumn("q", quantize_int8(F.col("vec"), F.col("absmax")))
    deq = q.withColumn("deq", dequantize_int8(F.col("q"), F.col("absmax")))
    return deq.select(
        "vec_id",
        F.round("absmax", 6).alias("scale_maxabs"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint")
        ).alias("q_checksum"),
        F.round(
            F.aggregate(
                F.zip_with(F.col("vec"), F.col("deq"), lambda x, d: F.abs(x - d)),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ),
            6,
        ).alias("max_err"),
    )


@query(
    "q_llm_dataset_card",
    oracle="""
    WITH per AS (
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_words
        FROM documents GROUP BY source, lang
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
    SELECT per.source, per.lang, per.n_docs, per.total_chars, per.avg_words,
           ROUND(100.0 * per.n_docs / tot.n, 4) AS pct_docs
    FROM per CROSS JOIN tot
    """,
)
def q_llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics (the per-source/lang composition table
    every training-data release ships — SURVEY §2.J7 extension): doc
    counts, char totals, mean word length, and corpus share.  The
    corpus total is a 1-row broadcast joined onto the grouped result
    (TPC-H Q11's threshold pattern) — no second pass over the corpus,
    no single-partition window; two partial-aggregated shuffles
    total."""
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_words"),
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "avg_words",
        F.round(100.0 * F.col("n_docs") / F.col("n"), 4).alias("pct_docs"),
    )


@query(
    "q_mutate_delete",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE NOT (o_orderstatus = 'O' AND o_totalprice < 50000)
    GROUP BY o_orderstatus
    """,
)
def q_mutate_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write point DELETE through the driver contract (SURVEY
    §2.I6; operators/mutate.delete_where — the reference's
    `DELETE FROM import_queue` repo/importer.py:174-175 generalized to
    fact tables): a fingerprint-cached copy of orders has open
    low-value rows deleted, then is read back and aggregated.  The
    oracle states the survivor set declaratively — the rewrite must
    change WHICH rows exist and nothing else.  The rewrite is
    all-or-nothing (write new dir → rename swap), the same publish
    protocol the incremental writer uses; readers never see a
    half-deleted table."""
    from clickhub_spark.artifacts import build_artifact
    from clickhub_spark.operators.mutate import delete_where

    src = load(spark, sf_dir, "orders")

    def _build(build: str) -> None:
        src.write.mode("overwrite").parquet(build)
        delete_where(
            spark,
            build,
            (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 50000),
        )

    path = build_artifact(src, "mutate_delete_orders", _build)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "q_queue_fs",
    oracle="""
    SELECT CAST(5 - r_regionkey AS INT) AS claim_seq, r_name
    FROM region
    """,
)
def q_queue_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filesystem-CAS queue backend through the driver contract
    (SURVEY §2.I5-I7; q_queue_sqlite's twin — both backends now have
    driver rows, same claim protocol, same deterministic drain order):
    one job per region at priority r_regionkey, drained by a single
    worker.  Claim order is priority DESC (queue.py:150, the
    reference's candidate scan repo/importer.py:138-139), so
    claim_seq = 5 - r_regionkey.  Coordination state is driver-local
    by design (≤10k rows); only the job source is distributed."""
    import tempfile

    from clickhub_spark.queue import WorkQueue

    regions = load(spark, sf_dir, "region").select("r_regionkey", "r_name").collect()
    with tempfile.TemporaryDirectory() as d:
        q = WorkQueue(d)
        for r in regions:
            q.schedule(r["r_name"], priority=int(r["r_regionkey"]))
        claimed: list[str] = []
        q.work("w1", lambda job: claimed.append(job.repo_name), max_polls=len(regions))
    return spark.createDataFrame(
        [(i + 1, name) for i, name in enumerate(claimed)],
        "claim_seq int, r_name string",
    )


@query(
    "q_scan_bloom",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 4) AS value
    FROM events WHERE user_id IN (3, 9)
    """,
)
def q_scan_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-skip-index point lookup (SURVEY §2.A6; ClickHouse
    `INDEX ... TYPE bloom_filter` analog, sources/writer.write_sorted
    bloom_cols): events are re-clustered sorted by ts with a parquet
    bloom filter on user_id — a high-cardinality column OUTSIDE the
    sort prefix, where min/max spans everything and only the bloom
    can skip row groups.  The point-IN probe reads the bloom-indexed
    copy; the oracle is the same predicate on the raw table — the
    index must never change results, only pruning.  At 100 TB this is
    the `actor_id = X` needle query: touched row groups ≈ those that
    contain X."""
    from clickhub_spark.artifacts import build_artifact
    from clickhub_spark.sources.writer import write_sorted

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    path = build_artifact(
        ev,
        "bloom_events",
        lambda build: write_sorted(
            ev, build, partition_by=None, sort_cols=["ts"],
            mode="overwrite", bloom_cols=["user_id"],
        ),
    )
    b = spark.read.parquet(path)
    return b.where(F.col("user_id").isin(3, 9)).select(
        "event_id", "user_id", "event_type", F.round("value", 4).alias("value")
    )


@query(
    "q_agg_quantiles_multi",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) AS qs
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           ROUND(qs[1], 4) AS p25, ROUND(qs[2], 4) AS p50,
           ROUND(qs[3], 4) AS p75, ROUND(qs[4], 4) AS p95
    FROM q
    """,
)
def q_agg_quantiles_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile aggregate (ClickHouse quantiles(0.25,0.5,0.75,
    0.95)(x) — SURVEY §2.D13 extension): ONE pass computing the whole
    quantile vector, exported as scalar columns (engine-exact linear
    interpolation on both sides).  At 100 TB the single-sort-per-group
    multi-quantile beats four separate percentile aggregates 4×; for
    the truly huge case the approx variant (q_agg_approx_quantile)
    is the scale path."""
    qs = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.percentile("value", F.lit([0.25, 0.5, 0.75, 0.95])).alias("qs"))
    )
    return qs.select(
        "event_type",
        *[
            F.round(F.element_at("qs", i + 1), 4).alias(a)
            for i, a in enumerate(["p25", "p50", "p75", "p95"])
        ],
    )


@query(
    "q_agg_bitops",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS ba,
           CAST(bit_or(user_id) AS BIGINT) AS bo,
           CAST(bit_xor(user_id) AS BIGINT) AS bx
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (ClickHouse groupBitAnd / groupBitOr /
    groupBitXor — SURVEY §2.D extension): AND/OR/XOR folds over the
    user-id bits per event type.  All three are associative +
    commutative, so Spark partial-aggregates them map-side — the
    shuffle carries one 8-byte triple per (partition, group)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.bit_and("user_id").alias("ba"),
            F.bit_or("user_id").alias("bo"),
            F.bit_xor("user_id").alias("bx"),
        )
    )


@query(
    "q_agg_moments",
    oracle="""
    WITH mu AS (
        SELECT event_type, AVG(value) AS m, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           mu.n,
           ROUND(AVG(POW(e.value - mu.m, 3))
                 / POW(AVG(POW(e.value - mu.m, 2)), 1.5), 4) AS skew,
           ROUND(AVG(POW(e.value - mu.m, 4))
                 / POW(AVG(POW(e.value - mu.m, 2)), 2) - 3, 4) AS kurt
    FROM events e JOIN mu USING (event_type)
    GROUP BY e.event_type, mu.n
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates (ClickHouse skewPop / kurtPop — SURVEY
    §2.D13 extension): population skewness and excess kurtosis per
    event type via Spark's builtin one-pass moment aggregates.  The
    oracle states the definition explicitly (two-pass centered
    moments) because DuckDB's builtins are SAMPLE-corrected — the
    engines' names disagree, the math here is pinned to population
    form.  One partial-aggregated shuffle; no second data pass in
    Spark (the two-pass form is oracle-only)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.skewness("value"), 4).alias("skew"),
            F.round(F.kurtosis("value"), 4).alias("kurt"),
        )
    )


@query(
    "q_fn_dictget",
    oracle="""
    SELECT c.c_custkey,
           coalesce(n.n_name, 'unknown') AS nation_name,
           coalesce(n2.n_name, 'unknown') AS shifted_name
    FROM customer c
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN nation n2 ON n2.n_nationkey = c.c_nationkey + 20
    """,
)
def q_fn_dictget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary lookup (ClickHouse dictGet / dictGetOrDefault —
    SURVEY §2.G extension): the nation dim becomes an in-plan literal
    map (collected driver-side — bounded exactly like the IVF
    centroid table; 25 rows here, dictionaries are ≤millions by
    definition) probed with element_at, incl. the miss→default path
    via a shifted key.  This is ClickHouse's dictionary semantics
    re-expressed: at 100 TB the map literal ships once per executor
    inside the serialized plan — no join, no shuffle, map-only;
    the LEFT JOIN is the oracle's declarative equivalent."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    entries: list[F.Column] = []
    for row in nation:
        entries.append(F.lit(int(row["n_nationkey"])))
        entries.append(F.lit(row["n_name"]))
    dict_map = F.create_map(*entries)
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.element_at(dict_map, F.col("c_nationkey")), F.lit("unknown")
        ).alias("nation_name"),
        F.coalesce(
            F.element_at(dict_map, F.col("c_nationkey") + 20), F.lit("unknown")
        ).alias("shifted_name"),
    )


@query(
    "q_agg_moving_array",
    oracle="""
    WITH mov AS (
        SELECT user_id, ts, event_id,
               SUM(CAST(floor(value) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m3
        FROM events
    )
    SELECT user_id,
           string_agg(CAST(m3 AS VARCHAR), ',' ORDER BY ts, event_id)
               AS moving_sums,
           CAST(count(*) AS BIGINT) AS n_events
    FROM mov GROUP BY user_id
    """,
)
def q_agg_moving_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArrayMovingSum analog (ClickHouse's array-returning moving
    aggregate — SURVEY §2.D/G5 composite): the 3-event moving sum per
    user, collected into a time-ordered series.  Values are floor()ed
    to integers so the series content is bit-exact across engines; the
    series is exported as a CSV string, NOT an array — the correctness
    driver's pandas canonicalizer cannot sort array cells (the exact
    round-6 driver-red failure on this query).  One shuffle on user_id
    shared by the window pass and the collect; array_sort on a
    (ts, event_id, m3) struct makes the collect order deterministic
    under parallel merge."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    mov = load(spark, sf_dir, "events").withColumn(
        "m3", F.sum(F.floor("value").cast("bigint")).over(w)
    )
    return (
        mov.groupBy("user_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "m3"))
                    ),
                    lambda s: s["m3"].cast("string"),
                ),
            ).alias("moving_sums"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _format_copy(spark: SparkSession, sf_dir: str, table: str, fmt: str, tag: str,
                 writer_opts: dict | None = None):
    """Build (once per input fingerprint) a copy of ``table`` in an
    interchange format and return (DataFrame-read-back, path).  The
    read uses the SOURCE's exact schema — schema-on-read with explicit
    types, never inference: at 100 TB an inferSchema pass would read
    the whole dataset twice, and CSV/JSON type guessing is
    locale-fragile besides."""
    from clickhub_spark.artifacts import build_artifact

    src = load(spark, sf_dir, table)

    def _build(build: str) -> None:
        w = src.write.mode("overwrite").format(fmt)
        for k, v in (writer_opts or {}).items():
            w = w.option(k, v)
        w.save(build)

    path = build_artifact(src, tag, _build)
    r = spark.read.format(fmt).schema(src.schema)
    for k, v in (writer_opts or {}).items():
        r = r.option(k, v)
    return r.load(path)


@query(
    "q_scan_csv",
    oracle="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with header (SURVEY §2.A1 sibling — the reference's
    FORMAT CSVWithNames import path): a headered-CSV copy of supplier
    is read back with the explicit source schema (no inferSchema — at
    scale that is a full extra pass) and aggregated.  The oracle runs
    on the parquet canon: format round-trips must never change
    values.  CSV scans split by line ranges, so parallelism matches
    parquet; pushdown is projection-only (row format) — stated, not
    hidden."""
    csv = _format_copy(
        spark, sf_dir, "supplier", "csv", "csv_supplier", {"header": "true"}
    )
    return csv.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@query(
    "q_scan_jsonl",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(MAX(p_size) AS INT) AS max_size
    FROM part GROUP BY p_brand
    """,
)
def q_scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source (SURVEY §2.A1 sibling — the reference's
    JSONEachRow, clickhub's native event-feed format): a JSONL copy of
    part read back with the explicit schema and aggregated; oracle on
    the parquet canon.  Line-delimited JSON splits like CSV; the
    explicit schema skips both the inference pass and the
    per-record key discovery that makes schemaless JSON scans 10×
    slower at 100 TB."""
    js = _format_copy(spark, sf_dir, "part", "json", "jsonl_part")
    return js.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("p_size").alias("max_size"),
    )


@query(
    "q_scan_orc",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar source (SURVEY §2.A2 sibling — the second columnar
    interchange format every lakehouse speaks): an ORC copy of
    customer read back and aggregated; oracle on the parquet canon.
    ORC keeps the columnar fast path — column pruning, predicate
    pushdown into stripe/row-group indexes, vectorized read — so
    engine capability does not degrade when upstream data arrives as
    ORC instead of parquet."""
    orc = _format_copy(spark, sf_dir, "customer", "orc", "orc_customer")
    return orc.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


@query(
    "q_llm_semdedup",
    oracle="""
    WITH k AS (
        SELECT GREATEST(8, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS k
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        FROM embeddings WHERE vec_id < (SELECT k FROM k)
    ), asg AS (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
               arg_max(c.cid, list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), c.cvec)) AS cluster
        FROM embeddings e CROSS JOIN cent c GROUP BY e.vec_id, v
    ), pairs AS (
        SELECT b.vec_id, a.cluster, a.vec_id AS keeper_cand,
               list_cosine_similarity(a.v, b.v) AS sim
        FROM asg a JOIN asg b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) > 0.35
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           MIN(keeper_cand) AS keeper,
           ROUND(MAX(sim), 4) AS max_sim
    FROM pairs GROUP BY vec_id, cluster
    """,
)
def q_llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic near-dup removal (operators/dedup.
    semantic_dedup; Abbas et al. 2023): embeddings clustered around
    k = max(8, ceil(sqrt(n))) deterministic centroids, intra-cluster
    pairs above cosine 0.35 dedup'd keeping the lowest id.  The
    oracle restates k from COUNT(*) (sqrt of an integer is a
    correctly-rounded IEEE op — bit-identical across engines), then
    cluster assignment + bounded pairwise scan declaratively; the
    Spark plan is inlined-centroid assignment (map-only, no Exchange)
    then a CLUSTER-partitioned self-join.  The sqrt law is the
    paper's scale contract made live: cells average ~sqrt(n) rows so
    pairwise work totals ~n (linear), and join parallelism = k grows
    with the corpus (round 5 pinned k=8: max 8 tasks, 20.4 s at
    sf0.1; auto-k=45 runs the same corpus in ~0.7 s)."""
    from clickhub_spark.operators.dedup import semantic_dedup

    return semantic_dedup(load(spark, sf_dir, "embeddings"))


@query(
    "q_llm_importance_sample",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               LEAST(1.0, len(string_split(text, ' ')) / 120.0) AS p_keep,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                    AS DOUBLE) / 65536.0 AS u
        FROM documents
    )
    SELECT doc_id, source, ROUND(p_keep, 4) AS p_keep
    FROM scored WHERE u < p_keep
    """,
)
def q_llm_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional deterministic sampling (the DSIR /
    importance-resampling shape every data-mixing pipeline runs —
    SURVEY §2.J7 extension next to q_sample_hash): each doc is kept
    with probability proportional to a quality proxy (here capped
    word count — stand-in for a classifier score), decided by
    comparing the doc's md5-uniform against its own weight.  Hash
    sampling, not rand(): repeatable across runs/engines, joinable,
    and map-only at any scale — no shuffle, no global state."""
    docs = load(spark, sf_dir, "documents")
    p_keep = F.least(F.lit(1.0), F.size(F.split("text", " ")) / 120.0)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "double"
    ) / 65536.0
    return (
        docs.select("doc_id", "source", p_keep.alias("p_keep"), u.alias("u"))
        .where(F.col("u") < F.col("p_keep"))
        .select("doc_id", "source", F.round("p_keep", 4).alias("p_keep"))
    )


@query(
    "q_win_locf",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT user_id, event_id,
           ROUND(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING), 4) AS v_filled,
           v IS NULL AS was_gap
    FROM x
    """,
)
def q_win_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill (ClickHouse WITH FILL
    INTERPOLATE / any time-series store's LOCF — SURVEY §2.H
    extension next to q_fill_gaps): error readings are nulled out and
    forward-filled from the last good per-user value via IGNORE NULLS
    last().  One shuffle on user_id; the running frame makes the fill
    a single linear pass per partition — no self-join, no
    as-of lookup."""
    ev = load(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@query(
    "q_agg_mad",
    oracle="""
    WITH med AS (
        SELECT event_type AS et, median(value) AS m FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(ANY_VALUE(med.m), 4) AS med,
           ROUND(median(abs(e.value - med.m)), 4) AS mad
    FROM events e JOIN med ON med.et = e.event_type
    GROUP BY e.event_type
    """,
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation (ClickHouse has quantile-combinator
    forms; MAD is the robust-stats outlier scale every data-quality
    monitor wants — SURVEY §2.D13 extension): two exact median
    passes, with the per-group medians BROADCAST back onto the fact
    scan (groups ≪ rows — the same shape as TPC-H Q11's threshold
    join), so the big side shuffles once per pass and never builds a
    hash table of itself."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.percentile("value", 0.5).alias("m")
    )
    return (
        ev.join(F.broadcast(med), ev["event_type"] == med["et"])
        .groupBy("event_type")
        .agg(
            F.round(F.first("m"), 4).alias("med"),
            F.round(F.percentile(F.abs(F.col("value") - F.col("m")), 0.5), 4).alias(
                "mad"
            ),
        )
    )


@query(
    "q_agg_ttest",
    oracle="""
    WITH s AS (
        SELECT AVG(value) FILTER (event_type = 'click') AS m1,
               var_samp(value) FILTER (event_type = 'click') AS v1,
               CAST(count(*) FILTER (event_type = 'click') AS DOUBLE) AS n1,
               AVG(value) FILTER (event_type = 'view') AS m2,
               var_samp(value) FILTER (event_type = 'view') AS v2,
               CAST(count(*) FILTER (event_type = 'view') AS DOUBLE) AS n2
        FROM events
    )
    SELECT ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
           ROUND(POW(v1 / n1 + v2 / n2, 2)
                 / (POW(v1 / n1, 2) / (n1 - 1) + POW(v2 / n2, 2) / (n2 - 1)),
                 2) AS df,
           CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_view
    FROM s
    """,
)
def q_agg_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test (ClickHouse welchTTest — SURVEY §2.D13
    extension): t statistic and Welch–Satterthwaite degrees of freedom
    comparing click vs view purchase values, computed from conditional
    moment aggregates in ONE pass over the fact table (countIf/avgIf/
    varSampIf all partial-aggregate map-side; the final row is a
    1-tuple reduce).  The statistic's formula is pinned in the oracle
    so both engines state identical math."""
    ev = load(spark, sf_dir, "events")
    click = F.col("event_type") == "click"
    view = F.col("event_type") == "view"
    s = ev.agg(
        F.avg(F.when(click, F.col("value"))).alias("m1"),
        F.var_samp(F.when(click, F.col("value"))).alias("v1"),
        F.count(F.when(click, 1)).cast("double").alias("n1"),
        F.avg(F.when(view, F.col("value"))).alias("m2"),
        F.var_samp(F.when(view, F.col("value"))).alias("v2"),
        F.count(F.when(view, 1)).cast("double").alias("n2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return s.select(
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            2,
        ).alias("df"),
        F.col("n1").cast("bigint").alias("n_click"),
        F.col("n2").cast("bigint").alias("n_view"),
    )


@query(
    "q_fn_map_higher",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           COALESCE(string_agg(event_type, ',' ORDER BY event_type)
                    FILTER (cnt >= 3), '') AS hot_types,
           CAST(2 * SUM(cnt) AS BIGINT) AS total_doubled,
           CAST(SUM(cnt * length(event_type)) AS BIGINT) AS weighted
    FROM c GROUP BY user_id
    """,
)
def q_fn_map_higher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (ClickHouse mapFilter / mapApply /
    mapZip analogs; Spark map_filter / transform_values /
    map_zip_with — SURVEY §2.G5/G extension over q_fn_map): per-user
    event-count maps filtered by value, value-transformed, and zipped
    with a per-key weight map.  Results export as a key-sorted CSV
    string / scalars (map iteration order is engine-internal, and the
    correctness driver's pandas canonicalizer cannot sort array cells
    — the round-6 driver-red lesson; a user with NO hot types gets ''
    on both sides, hence the oracle's COALESCE over the FILTERed
    string_agg); everything after the count aggregate is map-side
    expression work."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    hot = F.map_keys(F.map_filter(F.col("m"), lambda k, v: v >= 3))
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    weights = F.transform_values(F.col("m"), lambda k, v: F.length(k).cast("bigint"))
    zipped = F.map_zip_with(F.col("m"), weights, lambda k, v, w: v * w)
    arr_sum = lambda c: F.aggregate(  # noqa: E731
        F.map_values(c), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return m.select(
        "user_id",
        F.concat_ws(",", F.array_sort(hot)).alias("hot_types"),
        arr_sum(doubled).alias("total_doubled"),
        arr_sum(zipped).alias("weighted"),
    )


@query(
    "q_sort_global",
    oracle="""
    SELECT event_id, ROUND(value, 4) AS value, event_type
    FROM events ORDER BY value DESC, event_id
    """,
)
def q_sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table ORDER BY (ClickHouse's ORDER BY without LIMIT —
    SURVEY §2.F sibling of the top-k rows, which deliberately AVOID
    this): a total sort of events by value.  The plan must be
    RangePartitioning — Spark samples the key distribution, assigns
    contiguous key ranges to partitions, and sorts within each, so a
    100 TB sort is (sample) + (1 shuffle) + (local sorts) with no
    single-node merge; plan-pinned by test_plans.  Unique tiebreaker
    keeps the order total."""
    return (
        load(spark, sf_dir, "events")
        .select("event_id", F.round("value", 4).alias("value"), "event_type")
        .orderBy(F.col("value").desc(), F.col("event_id"))
    )


@query(
    "q_system_parts",
    oracle="""
    SELECT 'orders' AS tbl, 'orders.parquet' AS part_name,
           CAST(count(*) AS BIGINT) AS rows_in_part
    FROM orders
    UNION ALL
    SELECT 'events', 'events.parquet', CAST(count(*) AS BIGINT)
    FROM events
    """,
)
def q_system_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """system.parts analog (ClickHouse's part-level introspection the
    reference ops flow reads before compaction/TTL decisions — SURVEY
    §3 adjunct): per-file row counts for storage tables derived from
    input_file_name() — Spark discovers the parts, it does not assume
    them.  The oracle states the fixture layout's ground truth (one
    part per canon table holding every row); a multi-file table would
    fail the compare honestly.  Counting by file is partial-aggregated
    and metadata-cheap at any scale."""
    out = None
    for tbl in ["orders", "events"]:
        df = (
            load(spark, sf_dir, tbl)
            .groupBy(
                F.element_at(F.split(F.input_file_name(), "/"), -1).alias("part_name")
            )
            .agg(F.count(F.lit(1)).alias("rows_in_part"))
            .select(F.lit(tbl).alias("tbl"), "part_name", "rows_in_part")
        )
        out = df if out is None else out.unionAll(df)
    return out


@query(
    "q_agg_deltasum",
    oracle="""
    WITH d AS (
        SELECT user_id, value,
               value - lag(value) OVER w AS delta,
               first_value(value) OVER wf AS v_first,
               last_value(value) OVER wf AS v_last,
               first_value(epoch_us(ts)) OVER wf AS t_first,
               last_value(epoch_us(ts)) OVER wf AS t_last
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           ROUND(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END), 4) + 0.0
               AS delta_sum,
           ROUND((ANY_VALUE(v_last) - ANY_VALUE(v_first))
                 / NULLIF(ANY_VALUE(t_last) - ANY_VALUE(t_first), 0)
                 * 1000000, 6) + 0.0 AS bounding_ratio
    FROM d GROUP BY user_id
    """,
)
def q_agg_deltasum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deltaSum + boundingRatio analogs (ClickHouse time-series
    aggregates — SURVEY §2.D extension): per user, the sum of POSITIVE
    deltas between consecutive readings (counter-increase semantics)
    and the end-to-end slope in value-per-second.  One user_id shuffle
    shared by the lag window and the aggregate; the slope uses
    min_by/max_by on the (ts, event_id) order key — no second window.
    ClickHouse computes deltaSum block-locally and merges; the window
    restatement is the order-deterministic distributed form."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events").withColumn(
        "delta", F.col("value") - F.lag("value").over(w)
    )
    okey = F.struct(F.col("ts"), F.col("event_id"))
    us = F.unix_micros(F.col("ts"))
    return ev.groupBy("user_id").agg(
        (
            F.round(
                F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0.0)), 4
            )
            + 0.0  # kill IEEE -0.0 (engines disagree on its sign bit)
        ).alias("delta_sum"),
        (
            F.round(
                (F.max_by(F.col("value"), okey) - F.min_by(F.col("value"), okey))
                / F.nullif(F.max_by(us, okey) - F.min_by(us, okey), F.lit(0))
                * 1_000_000,
                6,
            )
            + 0.0
        ).alias("bounding_ratio"),
    )


@query(
    "q_mutate_update",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' AND o_totalprice < 100000
                          THEN o_totalprice * 1.1 ELSE o_totalprice END), 2)
               AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_mutate_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write UPDATE through the driver contract (SURVEY §2
    ALTER UPDATE row; operators/mutate.update_where — previously
    unit-only): pending low-value orders get a 10% price bump in a
    fingerprint-cached copy, which is read back and aggregated.  The
    oracle states the post-update values declaratively — the rewrite
    must change exactly the matched rows' columns and nothing else.
    Same atomic dir-swap publish as q_mutate_delete."""
    from clickhub_spark.artifacts import build_artifact
    from clickhub_spark.operators.mutate import update_where

    src = load(spark, sf_dir, "orders")

    def _build(build: str) -> None:
        src.write.mode("overwrite").parquet(build)
        update_where(
            spark,
            build,
            (F.col("o_orderstatus") == "P") & (F.col("o_totalprice") < 100000),
            {"o_totalprice": F.col("o_totalprice") * 1.1},
        )

    path = build_artifact(src, "mutate_update_orders", _build)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "q_mutate_ttl",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_survivors,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us
    FROM events WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
    """,
)
def q_mutate_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL expiry through the driver contract (ClickHouse `TTL ts +
    INTERVAL` — operators/mutate.apply_ttl, previously unit-only):
    rows older than the cutoff are dropped from a fingerprint-cached
    copy.  The docstring caveat holds at scale: date-partitioned
    tables drop whole partition dirs instead of rewriting — this
    copy-on-write form is for unpartitioned state tables.  The oracle
    states the survivor set declaratively."""
    import datetime

    from clickhub_spark.artifacts import build_artifact
    from clickhub_spark.operators.mutate import apply_ttl

    src = load(spark, sf_dir, "events")

    def _build(build: str) -> None:
        src.write.mode("overwrite").parquet(build)
        apply_ttl(spark, build, "ts", datetime.datetime(2024, 1, 8))

    path = build_artifact(src, "mutate_ttl_events", _build)
    return spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.min(F.unix_micros("ts")).alias("min_ts_us"),
    )


@query(
    "q_agg_contingency",
    oracle="""
    WITH o AS (
        SELECT event_type AS r, CAST(user_id % 3 AS BIGINT) AS c,
               CAST(count(*) AS DOUBLE) AS obs
        FROM events GROUP BY r, c
    ), tot AS (
        SELECT r, c, obs,
               SUM(obs) OVER (PARTITION BY r) AS row_tot,
               SUM(obs) OVER (PARTITION BY c) AS col_tot,
               SUM(obs) OVER () AS n
        FROM o
    ), chi AS (
        SELECT SUM(POW(obs - row_tot * col_tot / n, 2)
                   / (row_tot * col_tot / n)) AS chi2,
               ANY_VALUE(n) AS n,
               CAST(COUNT(DISTINCT r) AS DOUBLE) AS nr,
               CAST(COUNT(DISTINCT c) AS DOUBLE) AS nc
        FROM tot
    )
    SELECT ROUND(chi2, 4) AS chi2,
           ROUND(SQRT(chi2 / (n * (LEAST(nr, nc) - 1))), 6) AS cramers_v
    FROM chi
    """,
)
def q_agg_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared + Cramér's V association (ClickHouse cramersV /
    contingency — SURVEY §2.D13 extension): dependence between event
    type and a user-bucket over the observed contingency table.  The
    table is first reduced to ~15 cells (one partial-aggregated
    shuffle over the facts); the window sums and the statistic run on
    that tiny grid — post-aggregation cost is O(cells), so the
    single-partition windows on the CELL table are fine at any corpus
    size."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("r"), (F.col("user_id") % 3).alias("c")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    wall = Window.partitionBy()
    t = (
        cells.withColumn("row_tot", F.sum("obs").over(wr))
        .withColumn("col_tot", F.sum("obs").over(wc))
        .withColumn("n", F.sum("obs").over(wall))
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi = t.agg(
        F.sum(F.pow(F.col("obs") - exp, 2) / exp).alias("chi2"),
        F.first("n").alias("n"),
        F.countDistinct("r").cast("double").alias("nr"),
        F.countDistinct("c").cast("double").alias("nc"),
    )
    return chi.select(
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("nr", "nc") - 1))), 6
        ).alias("cramers_v"),
    )


@query(
    "q_join_asof_fwd",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT min(c.ts) FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'purchase'
               AND c.ts >= e.ts) AS asof_ts
    FROM events e
    WHERE e.event_type = 'view'
    """,
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (ClickHouse `ASOF JOIN ... >=` — SURVEY
    §2.C8's other direction, previously backward-only): for each view
    event, the same user's EARLIEST purchase at or after it — the
    time-to-conversion primitive.  Same union+window single pass as
    the backward form with the time axis reversed
    (operators/asof.asof_join direction="forward"); no candidate-pair
    materialization."""
    from clickhub_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    return asof_join(
        views, buys, on=["user_id"], left_ts="ts", right_ts="ts",
        right_values=[], direction="forward",
    ).select("event_id", "user_id", "ts", "asof_ts")


@query(
    "q_fn_array_diff",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               list(CAST(floor(value) AS BIGINT) ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           array_to_string([CASE WHEN i = 1 THEN 0 ELSE vals[i] - vals[i - 1] END
            FOR i IN generate_series(1, len(vals))], ',') AS diffs,
           array_to_string([list_sum(vals[1:i])
            FOR i IN generate_series(1, len(vals))], ',') AS cumsum,
           CAST(len(vals) AS INT) AS n
    FROM seq
    """,
)
def q_fn_array_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrayDifference / arrayCumSum (ClickHouse's array-series
    functions over groupArray — SURVEY §2.G5 extension): per-user
    time-ordered value series with element-wise differences and
    running totals computed INSIDE the array via higher-order
    functions — no second window pass, one shuffle for the collect.
    Integer floor()ed values keep series content bit-exact across
    engines; both series export as CSV strings, not arrays — the
    correctness driver's pandas canonicalizer cannot sort array cells
    (round-6 driver-red lesson).  Honest cost note: the slice-fold
    cumsum is O(n²) per array (fine for bounded per-key series like
    these); for unbounded series use the running-sum WINDOW form
    (q_win_running) instead of collecting."""
    ev = load(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("ts", "event_id", F.floor("value").cast("bigint").alias("v"))
                )
            ),
            lambda s: s["v"],
        ).alias("vals")
    )
    idx = F.sequence(F.lit(1), F.size("vals"))
    return seq.select(
        "user_id",
        F.concat_ws(
            ",",
            F.transform(
                idx,
                lambda i: F.when(i == 1, F.lit(0).cast("bigint"))
                .otherwise(
                    F.element_at(F.col("vals"), i)
                    - F.element_at(F.col("vals"), i - 1)
                )
                .cast("string"),
            ),
        ).alias("diffs"),
        F.concat_ws(
            ",",
            F.transform(
                idx,
                lambda i: F.aggregate(
                    F.slice(F.col("vals"), 1, i),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ).cast("string"),
            ),
        ).alias("cumsum"),
        F.size("vals").alias("n"),
    )


@query(
    "q_llm_knn_ivf_exact",
    oracle="""
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
           ), 4) AS sim
    FROM embeddings e WHERE e.vec_id <> 0
    ORDER BY sim DESC, vec_id ASC LIMIT 10
    """,
)
def q_llm_knn_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at nprobe = n_cells (SURVEY §2.J6): probing EVERY cell
    makes IVF exactly equivalent to brute force, so the whole IVF
    machinery — build-once cell-partitioned index, driver-side
    centroid probe, partition-pruned candidate scan, top-k — is
    value-checked end-to-end against the same SQL oracle as
    q_llm_knn.  The production path (q_llm_knn_ivf, nprobe≪cells,
    rows-only + recall units) differs ONLY in the probe list; this
    twin pins everything else."""
    from clickhub_spark.operators.knn import ivf_topk

    return ivf_topk(
        load(spark, sf_dir, "embeddings"), query_id=0, k=10, n_cells=16, nprobe=16
    ).select("vec_id", "sim")


@query(
    "q_scan_partition_prune",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def q_scan_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partition-pruned scan through the driver contract (SURVEY
    §2.A6; the sparse-index/partition analog, unit-plan-tested in
    test_plans — this adds the value check): events re-clustered into
    event_type=... partition dirs once per input fingerprint, then one
    partition read back and aggregated.  At 100 TB the equality
    predicate never opens the other partitions' files (PartitionFilters
    prune at the file-listing level); the oracle is the same predicate
    on the raw table — layout must never change results."""
    from clickhub_spark.artifacts import build_artifact
    from clickhub_spark.sources.writer import write_sorted

    ev = load(spark, sf_dir, "events").select("event_type", "user_id", "value", "ts")
    path = build_artifact(
        ev,
        "events_by_type",
        lambda build: write_sorted(
            ev, build, partition_by="event_type", sort_cols=["ts"], mode="overwrite"
        ),
    )
    p = spark.read.parquet(path)
    return (
        p.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "q_stream_enrich",
    oracle="""
    SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP) AS window_start,
           n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e
    JOIN nation n ON n.n_nationkey = e.user_id % 25
    GROUP BY 1, 2
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, batch canon (SURVEY §2.I3
    adjunct — the third streaming join shape next to stream-stream
    q_stream_join and the windowed aggregates): tumbling-hour event
    aggregates enriched against a static dimension (user→nation via a
    deterministic FK).  In streaming form the dim is a broadcast
    static DataFrame joined per micro-batch — no stream state, no
    watermark needed on the dim side; tests/test_streaming.py's
    stream-static test pins that readStream shape's stream≡batch
    equivalence.  The batch canon broadcasts the same 25-row dim."""
    ev = load(spark, sf_dir, "events")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        ev.join(F.broadcast(nation), ev["user_id"] % 25 == nation["n_nationkey"])
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "q_scan_csv_permissive",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST(7 AS BIGINT) AS n_bad,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier
    """,
)
def q_scan_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant CSV ingest (SURVEY §2.A1's tolerant-TSV sibling
    on the CSV reader's own machinery): a headered-CSV copy of
    supplier gets 7 deterministic malformed lines appended, then is
    read in PERMISSIVE mode with columnNameOfCorruptRecord — bad rows
    land in the corrupt column instead of killing the scan, exactly
    the posture a 100 TB ingest needs (one mangled line must cost one
    row, not a job).  The oracle pins good-row fidelity (count + sum
    unchanged) and the exact bad count."""
    import glob
    import os

    from pyspark.sql.types import StructField, StringType

    from clickhub_spark.artifacts import build_artifact

    src = load(spark, sf_dir, "supplier")

    def _build(build: str) -> None:
        src.write.mode("overwrite").option("header", "true").csv(build)
        part = sorted(glob.glob(os.path.join(build, "part-*.csv")))[0]
        # the unparseable value sits in s_acctbal — a column the query
        # actually reads: CSV column pruning only PARSES referenced
        # columns, so garbage in an unreferenced field would never
        # trip the corrupt-record machinery
        with open(part, "a") as f:
            for i in range(7):
                f.write(f"{900000 + i},BROKEN,0,NOT_A_NUMBER\n")
        # the append invalidates Hadoop LocalFS's .crc sidecars —
        # drop them or the reader fails with ChecksumException
        # before PERMISSIVE mode ever sees a row
        for crc in glob.glob(os.path.join(build, ".*.crc")):
            os.remove(crc)

    path = build_artifact(src, "csv_supplier_badrows", _build)
    schema = src.schema.add(StructField("_corrupt", StringType()))
    bad = F.col("_corrupt").isNotNull()
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .agg(
            F.count(F.when(~bad, 1)).alias("n_good"),
            F.count(F.when(bad, 1)).alias("n_bad"),
            F.round(F.sum(F.when(~bad, F.col("s_acctbal"))), 2).alias("total_bal"),
        )
    )


@query(
    "q_fn_numbers",
    oracle="""
    WITH n AS (SELECT x AS num FROM generate_series(0, 9999) t(x))
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(num) AS BIGINT) AS total,
           CAST(SUM(CASE WHEN num % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div3,
           ROUND(AVG(SQRT(num)), 4) AS avg_sqrt
    FROM n
    """,
)
def q_fn_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numbers-table generator (ClickHouse system.numbers /
    numbers(N) — SURVEY §2.A5 adjacent, the zero-input test/backfill
    source every CH user leans on): ``spark.range`` IS that source —
    a distributed, splittable Range scan (each partition generates its
    slice; no data read, no single-point generator), here folded
    through arithmetic the oracle restates over generate_series."""
    n = spark.range(0, 10_000).withColumnRenamed("id", "num")
    return n.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("num").alias("total"),
        F.sum(F.when(F.col("num") % 3 == 0, 1).otherwise(0)).alias("n_div3"),
        F.round(F.avg(F.sqrt("num")), 4).alias("avg_sqrt"),
    )
