"""Round-5 coverage: ntile windows, geo + IP function families,
bitmap-aggregate distinct, distribution entropy, extended string +
date/time fns, keyed-map and bivariate-stat aggregates, MinHash
similarity estimation, char-trigram LM scoring, TF-IDF top terms,
training-record assembly, and Gopher-style quality rules
(SURVEY §2.G/H/D/J extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query


@query(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window (SURVEY §2.H extension — ClickHouse ntile):
    balance quartiles within each nation.  Unique tiebreaker
    (c_custkey) so both engines assign identical bucket membership;
    one shuffle on the partition key, standard window exec."""
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "q_fn_geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 180) - 89.5 AS lat,
               ((c_custkey * 7) % 360) - 179.5 AS lon
        FROM customer
    )
    SELECT c_custkey,
           ROUND(2 * 6371.0 * ASIN(SQRT(
               SIN(RADIANS(lat) / 2) * SIN(RADIANS(lat) / 2)
               + COS(RADIANS(lat)) * SIN(RADIANS(lon) / 2) * SIN(RADIANS(lon) / 2)
           )), 2) AS dist_km,
           CAST(FLOOR(lat / 10) AS BIGINT) AS cell_lat,
           CAST(FLOOR(lon / 10) AS BIGINT) AS cell_lon
    FROM pts
    """,
)
def q_fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo function family (ClickHouse greatCircleDistance /
    geohashEncode analogs, SURVEY §2.G extension): haversine
    great-circle distance to the origin plus a 10-degree grid cell id,
    all builtin trig — map-only, whole-stage-codegen, no UDF.  Coords
    are derived deterministically from the key so both engines compute
    from identical inputs."""
    c = load(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 180) - 89.5
    lon = ((F.col("c_custkey") * 7) % 360) - 179.5
    half_lat = F.radians(lat) / 2
    half_lon = F.radians(lon) / 2
    dist_km = (
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.sin(half_lat) * F.sin(half_lat)
                + F.cos(F.radians(lat)) * F.sin(half_lon) * F.sin(half_lon)
            )
        )
    )
    return c.select(
        "c_custkey",
        F.round(dist_km, 2).alias("dist_km"),
        F.floor(lat / 10).alias("cell_lat"),
        F.floor(lon / 10).alias("cell_lon"),
    )


@query(
    "q_fn_ip",
    oracle="""
    WITH ips AS (
        SELECT event_id, (user_id * 1000003 + 16909060) % 4294967296 AS ip_num
        FROM events
    )
    SELECT event_id, ip_num,
           CAST((ip_num // 16777216) % 256 AS VARCHAR) || '.' ||
           CAST((ip_num // 65536) % 256 AS VARCHAR) || '.' ||
           CAST((ip_num // 256) % 256 AS VARCHAR) || '.' ||
           CAST(ip_num % 256 AS VARCHAR) AS ip_str,
           (ip_num // 16777216) % 256 = 1 AS in_1_0_0_0_8
    FROM ips
    """,
)
def q_fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP function family (ClickHouse IPv4NumToString /
    IPv4StringToNum / isIPAddressInRange analogs, SURVEY §2.G
    extension): numeric↔dotted-quad conversion and a /8 CIDR
    membership test, pure integer arithmetic — map-only, no UDF.
    The address is derived deterministically from user_id so both
    engines see identical inputs."""
    ev = load(spark, sf_dir, "events")
    ip = (F.col("user_id") * 1000003 + 16909060) % F.lit(4294967296)
    octet = lambda div: (ip / div).cast("long") % 256  # noqa: E731
    return ev.select(
        "event_id",
        ip.alias("ip_num"),
        F.concat_ws(
            ".",
            octet(16777216).cast("string"),
            octet(65536).cast("string"),
            octet(256).cast("string"),
            (ip % 256).cast("string"),
        ).alias("ip_str"),
        (octet(16777216) == 1).alias("in_1_0_0_0_8"),
    )


@query(
    "q_agg_bitmap",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-aggregate distinct count (ClickHouse groupBitmap,
    SURVEY §2.D extension): users are bucketed by bit position
    (32768-bit buckets), each (event_type, bucket) builds one bitmap
    via bitmap_construct_agg — a fixed-width byte array with map-side
    partial aggregation — and per-bucket cardinalities sum to the
    exact distinct count.  At 100 TB this replaces a wide
    shuffle-distinct with compact mergeable state (the same reason
    ClickHouse ships groupBitmap); the oracle is the plain
    COUNT(DISTINCT)."""
    ev = load(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("n"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_users")
    )


@query(
    "q_agg_entropy",
    oracle="""
    WITH freq AS (
        SELECT event_type, user_id, COUNT(*) AS c FROM events
        GROUP BY event_type, user_id
    ), tot AS (
        SELECT event_type, SUM(c) AS t FROM freq GROUP BY event_type
    )
    SELECT f.event_type,
           ROUND(-SUM((c / t) * LOG2(c / t)), 4) AS entropy_bits,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_users
    FROM freq f JOIN tot USING (event_type)
    GROUP BY f.event_type
    """,
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of a distribution (ClickHouse ``entropy()``
    aggregate, SURVEY §2.D extension): per event type, the entropy of
    its user-activity distribution — two hash aggregations (freq,
    then entropy over freq), both with map-side partials; the skew
    diagnostic a training pipeline runs on source distributions."""
    freq = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
    )
    tot = F.sum("c").over(Window.partitionBy("event_type"))
    p = F.col("c") / F.col("t")
    return (
        freq.withColumn("t", tot)
        .groupBy("event_type")
        .agg(
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
            F.count("*").cast("long").alias("n_distinct_users"),
        )
    )


@query(
    "q_fn_string2",
    oracle="""
    SELECT doc_id,
           lpad(lang, 5, '_') AS lang_pad,
           repeat(lang, 2) AS lang2,
           reverse(source) AS rev_source,
           translate(lang, 'aeiou', 'AEIOU') AS lang_caps,
           split_part(text, ' ', 1) AS first_word,
           CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
               AS n_the
    FROM documents
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string function family (SURVEY §2.G1 extension —
    ClickHouse leftPad/repeat/reverse/translate/splitByChar[1]/
    countSubstrings): all builtin, map-only.  countSubstrings uses the
    replace-length identity on both sides (no regex, engine-exact)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.repeat("lang", 2).alias("lang2"),
        F.reverse("source").alias("rev_source"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_caps"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_word"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("the"))))
            / 3
        )
        .cast("long")
        .alias("n_the"),
    )


@query(
    "q_llm_minhash_sim",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
        WHERE len(ws) >= 3
    ), mins AS (
        SELECT doc_id, p, min(md5(shingle || ':' || p)) AS mh
        FROM sh, UNNEST(range(0, 16)) t(p)
        GROUP BY doc_id, p
    ), bands AS (
        SELECT doc_id, p // 4 AS band,
               md5(string_agg(mh, '|' ORDER BY p)) AS bh
        FROM mins GROUP BY doc_id, p // 4
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ), est AS (
        SELECT p.id_a, p.id_b,
               ROUND(AVG(CASE WHEN ma.mh = mb.mh THEN 1.0 ELSE 0.0 END), 4)
                   AS est_sim
        FROM pairs p
        JOIN mins ma ON ma.doc_id = p.id_a
        JOIN mins mb ON mb.doc_id = p.id_b AND mb.p = ma.p
        GROUP BY p.id_a, p.id_b
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS ni
        FROM pairs p
        JOIN sh a ON a.doc_id = p.id_a
        JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
        GROUP BY p.id_a, p.id_b
    )
    SELECT e.id_a, e.id_b, e.est_sim,
           ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
                 / (sa.n + sb.n - COALESCE(i.ni, 0)), 4) AS jaccard
    FROM est e
    LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    JOIN sizes sa ON sa.doc_id = e.id_a
    JOIN sizes sb ON sb.doc_id = e.id_b
    """,
)
def q_llm_minhash_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash similarity ESTIMATION on LSH candidate pairs
    (SURVEY §2.J5 extension): the step between candidate generation
    and the dedup keep/drop decision — signature-match fraction as the
    Jaccard estimate, exact shingle Jaccard alongside for threshold
    tuning.  The estimate is a map-side zip_with over joined
    signature arrays (no shuffle beyond the pair join); exact Jaccard
    runs only on the LSH-pruned candidates, never all pairs."""
    from clickhub_spark.operators.dedup import minhash_similarity_md5

    return minhash_similarity_md5(
        load(spark, sf_dir, "documents"), "text", "doc_id", k=3, num_perm=16, bands=4
    )


@query(
    "q_llm_ngram_lm",
    oracle="""
    WITH docs AS (
        SELECT doc_id, text FROM documents WHERE length(text) >= 3
    ), tri AS (
        SELECT doc_id, substr(text, i, 3) AS t
        FROM docs, UNNEST(range(1, length(text) - 1)) u(i)
    ), corpus AS (
        SELECT t, COUNT(*) AS c FROM tri GROUP BY t
    ), tot AS (
        SELECT SUM(c) AS total FROM corpus
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(-AVG(LN(c / total)) / LN(2), 4) AS bits_per_trigram
    FROM tri d JOIN corpus USING (t) CROSS JOIN tot
    GROUP BY d.doc_id
    """,
)
def q_llm_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram LM scoring (SURVEY north-star quality
    scoring; the char-level sibling of the word-bigram perplexity in
    operators/lm.py): corpus trigram frequencies → per-doc mean
    negative log2 probability.  Trigram explode is builtin
    (sequence → transform → explode, codegen, no UDF); corpus counts
    are one hash agg; the scoring join broadcasts nothing bigger than
    the trigram table (bounded: ≤ alphabet³ distinct keys — at 100 TB
    the model table stays small even when the corpus doesn't)."""
    docs = (
        load(spark, sf_dir, "documents")
        .where(F.length("text") >= 3)
        .select("doc_id", "text")
    )
    tri = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substr(text, i, 3))")
        ).alias("t"),
    )
    corpus = tri.groupBy("t").agg(F.count("*").alias("c"))
    total = corpus.agg(F.sum("c").alias("total"))
    scored = (
        tri.join(F.broadcast(corpus), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.round(
                -F.avg(F.log(F.col("c") / F.col("total"))) / F.lit(0.6931471805599453),
                4,
            ).alias("bits_per_trigram"),
        )
    )
    return scored


@query(
    "q_llm_docstore_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars,
           ROUND(SQRT(list_aggregate(
               list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x),
               'sum')), 4) AS emb_norm,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.n_chars >= 100
    """,
)
def q_llm_docstore_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-record assembly (north star): join the document store
    with its embedding table 1:1 on id, attach the features downstream
    sampling needs (embedding L2 norm, token count), filter short
    docs.  Both sides shuffle on the id — at 100 TB write both tables
    bucketed on doc_id (sources/writer.write_bucketed) and this join
    goes Exchange-free, as plan-pinned by q_join_bucketed."""
    from clickhub_spark.functions.vectors import as_double

    d = load(spark, sf_dir, "documents").where(F.col("n_chars") >= 100)
    e = load(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            as_double(F.col("embedding")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return (
        d.join(e, d["doc_id"] == e["vec_id"])
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(norm, 4).alias("emb_norm"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )


@query(
    "q_llm_quality_v2",
    oracle="""
    WITH stats AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               length(replace(text, ' ', '')) AS n_nonspace,
               length(text) AS n_chars_t,
               (length(text) - length(replace(text, 'the', ''))) / 3 AS n_the,
               (length(text) - length(replace(text, 'data', ''))) / 4 AS n_data
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(CAST(n_nonspace AS DOUBLE) / n_words, 4) AS mean_word_len,
           CAST(n_the + n_data > 0 AS BOOLEAN) AS has_common_word,
           CAST(n_words >= 10 AND n_words <= 1000
                AND CAST(n_nonspace AS DOUBLE) / n_words BETWEEN 3 AND 10
                AND n_the + n_data > 0 AS BOOLEAN) AS keep
    FROM stats
    """,
)
def q_llm_quality_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (north star, beyond q_llm_quality's
    lexical-diversity gate): word-count bounds, mean word length
    window, common-word presence — the standard pretraining heuristics
    (Rae et al. 2021 §A1.1), composed from builtin string fns only;
    map-only, no shuffle, no UDF."""
    d = load(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    n_nonspace = F.length(F.replace(F.col("text"), F.lit(" ")))
    n_the = (F.length("text") - F.length(F.replace(F.col("text"), F.lit("the")))) / 3
    n_data = (F.length("text") - F.length(F.replace(F.col("text"), F.lit("data")))) / 4
    mean_wl = n_nonspace.cast("double") / n_words
    keep = (
        (n_words >= 10)
        & (n_words <= 1000)
        & mean_wl.between(3, 10)
        & ((n_the + n_data) > 0)
    )
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        ((n_the + n_data) > 0).alias("has_common_word"),
        keep.alias("keep"),
    )


@query(
    "q_agg_summap",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, ROUND(SUM(value), 4) AS s
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS k,
           string_agg(CAST(CAST(s AS DECIMAL(18,4)) AS VARCHAR), ','
                      ORDER BY event_type) AS v
    FROM per GROUP BY user_id
    """,
)
def q_agg_summap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed-map aggregation (ClickHouse sumMap, SURVEY §2.D
    extension): per user, value totals keyed by event type as aligned
    key/value CSV strings — ClickHouse's Map-typed summation
    re-expressed as two hash aggregations (inner keyed sum with
    map-side partials, then a sorted collect per user).  The map is
    exported in a SCALAR wire form (key-sorted CSV, doubles rendered
    through DECIMAL(18,4) so both engines pad identically and IEEE
    -0.0 normalizes away) because the correctness driver's pandas
    canonicalizer cannot sort array cells — the round-6 driver-red
    lesson; same reshape as q_llm_embed_centroid in round 3.  A sum
    outside DECIMAL(18,4) range (|s| ≥ 10^14, or NaN) casts to NULL
    under Spark's non-ANSI cast; rendering it as the literal 'null'
    keeps k and v ALIGNED instead of concat_ws silently skipping the
    element (review r7) — the DuckDB oracle hard-errors on the same
    overflow, so the divergence is loud on both sides."""
    per = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.round(F.sum("value"), 4).alias("s"))
    )
    pairs = F.sort_array(F.collect_list(F.struct("event_type", "s")))
    return per.groupBy("user_id").agg(
        F.concat_ws(",", F.transform(pairs, lambda p: p["event_type"])).alias("k"),
        F.concat_ws(
            ",",
            F.transform(
                pairs,
                lambda p: F.coalesce(
                    p["s"].cast("decimal(18,4)").cast("string"), F.lit("null")
                ),
            ),
        ).alias("v"),
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT event_type,
           ROUND(corr(value, user_id), 4) AS corr_vu,
           ROUND(covar_samp(value, user_id), 4) AS covar_vu,
           ROUND(regr_slope(value, user_id), 4) AS slope
    FROM events GROUP BY event_type
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics aggregates (ClickHouse corr / covarSamp /
    simpleLinearRegression, SURVEY §2.D13 extension): one hash
    aggregation with mergeable moment sketches — the same
    partial/final shape as sum, so it scales identically."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", "user_id"), 4).alias("corr_vu"),
        F.round(F.covar_samp("value", "user_id"), 4).alias("covar_vu"),
        F.round(F.regr_slope("value", "user_id"), 4).alias("slope"),
    )


@query(
    "q_fn_datetime2",
    oracle="""
    SELECT event_id,
           date_diff('day', DATE '2024-06-01', CAST(ts AS DATE)) AS days_since,
           CAST(ts + INTERVAL 2 MONTH AS DATE) AS plus2m,
           last_day(CAST(ts AS DATE)) AS month_end,
           strftime(ts, '%Y-%m') AS ym,
           (dayofweek(ts) + 6) % 7 AS dow_mon0,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS unix_ts
    FROM events
    """,
)
def q_fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date/time function family (ClickHouse dateDiff /
    addMonths / toLastDayOfMonth / formatDateTime / toDayOfWeek /
    toUnixTimestamp analogs, SURVEY §2.G2 extension) — map-only
    builtins.  Day-of-week is normalized to Monday=0 on both sides
    (Spark dayofweek is 1=Sunday, DuckDB 0=Sunday — ClickHouse's
    toDayOfWeek is Monday-based)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.datediff(F.to_date("ts"), F.lit("2024-06-01").cast("date")).alias(
            "days_since"
        ),
        F.add_months(F.to_date("ts"), 2).alias("plus2m"),
        F.last_day(F.to_date("ts")).alias("month_end"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
        ((F.dayofweek("ts") + 5) % 7).alias("dow_mon0"),
        F.unix_timestamp("ts").alias("unix_ts"),
    )


@query(
    "q_llm_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ), df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
    ), n AS (
        SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
        SELECT t.doc_id, t.tok,
               ROUND(t.tf * LN(CAST(n.n_docs AS DOUBLE) / d.df), 4) AS tfidf,
               row_number() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY t.tf * LN(CAST(n.n_docs AS DOUBLE) / d.df) DESC,
                            t.tok
               ) AS rn
        FROM tf t JOIN df d USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, CAST(rn AS INT) AS rn
    FROM scored WHERE rn <= 5
    """,
)
def q_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-terms per document (north star — the classic
    relevance/keyword-extraction op): term frequency per doc, document
    frequency over the corpus, top-5 terms per doc by tf·idf with a
    deterministic token tiebreak.  The document-frequency table is
    vocabulary-sized and broadcasts; the rank is a per-doc window
    (partitioned, never global).  At 100 TB: two hash aggs + one
    broadcast join + a partitioned window — no global sort anywhere."""
    from pyspark.sql.window import Window as W

    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = (
        load(spark, sf_dir, "documents").agg(
            F.countDistinct("doc_id").alias("n_docs")
        )
    )
    tfidf = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
    )
    w = W.partitionBy("doc_id").orderBy(
        (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).desc(),
        F.col("tok"),
    )
    return (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            tfidf.alias("tfidf"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 5)
    )


@query(
    "q_scan_zorder",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE user_id BETWEEN 3 AND 7 AND value BETWEEN 100 AND 400
    """,
)
def q_scan_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional skipping scan (SURVEY §2.A6 extension —
    Delta/Iceberg OPTIMIZE ZORDER analog; sources/writer.write_zordered):
    a z-ordered copy of events clustered on (user_id, value) is built
    once per input fingerprint, then a two-dimensional range predicate
    reads it — parquet min/max prunes files/row-groups on BOTH columns
    because the Morton layout gives every file locality in each
    dimension (test_projections pins the span property).  The oracle
    is the same predicate on the raw table: layout must never change
    results."""
    from clickhub_spark.artifacts import build_artifact
    from clickhub_spark.sources.writer import write_zordered

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath = build_artifact(
        ev,
        "zorder_events",
        lambda build: write_zordered(
            ev, build, ["user_id", "value"], bits=8, target_files=16
        ),
    )
    z = spark.read.parquet(zpath)
    return z.where(
        F.col("user_id").between(3, 7) & F.col("value").between(100, 400)
    ).select("event_id", "user_id", F.round("value", 4).alias("value"))


@query(
    "q_fn_encode",
    oracle="""
    SELECT doc_id,
           base64(encode(text)) AS text_b64,
           lower(to_hex(doc_id)) AS id_hex,
           decode(from_base64(base64(encode(lang)))) = lang AS b64_roundtrip
    FROM documents
    """,
)
def q_fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode/decode function family (ClickHouse base64Encode /
    base64Decode / hex analogs, SURVEY §2.G7 extension): RFC 4648
    base64, lowercase unpadded hex of an integer, and a
    decode(encode()) round-trip proof — map-only builtins.  Spark's
    base64 emits MIME CRLF line breaks every 76 chars (ClickHouse and
    DuckDB don't) — stripped here so the output is the canonical
    unchunked form."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.replace(
            F.base64(F.col("text").cast("binary")), F.lit("\r\n")
        ).alias("text_b64"),
        F.lower(F.hex("doc_id")).alias("id_hex"),
        (
            F.unbase64(F.base64(F.col("lang").cast("binary"))).cast("string")
            == F.col("lang")
        ).alias("b64_roundtrip"),
    )


@query(
    "q_win_nth",
    oracle="""
    SELECT event_id, user_id,
           nth_value(event_id, 3) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS third_event,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_in_frame
    FROM events
    """,
)
def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value window (ClickHouse nthValue, SURVEY §2.H extension):
    each user's third-ever event id (NULL until three events have
    accumulated) plus a bounded trailing frame count — one shuffle on
    the partition key, unique (ts, event_id) ordering so both engines
    see identical frames."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.nth_value("event_id", 3)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("third_event"),
        F.count("*")
        .over(w.rowsBetween(-2, Window.currentRow))
        .cast("long")
        .alias("n_in_frame"),
    )
