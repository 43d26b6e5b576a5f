"""LLM training-data pipeline operators — SURVEY §2.J and the north-
star extensions (BASELINE.json): dedup (exact / MinHash-LSH / SimHash
/ n-gram Jaccard), similarity search, text analysis, fingerprinting,
and the UDF/UDAF/UDTF surface, all over the driver's ``documents`` /
``embeddings`` tables.

Engine-portable hashes (md5/sha2) are used wherever an oracle checks
values; xxhash64 (JVM-only, faster) is used for engine-internal
bucketing where the check is rows-only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from clickhub_spark.catalog import load
from clickhub_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Dedup family (§2.J4, J5)
# ---------------------------------------------------------------------------


@query(
    "q_llm_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, COUNT(*) AS n_dups,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text)
    """,
)
def q_llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash groupBy (SURVEY §2.J4) — one
    shuffle on the 128-bit hash; the canonical 100 TB first-pass."""
    from clickhub_spark.operators.dedup import exact_dup_groups

    return exact_dup_groups(load(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "q_llm_dedup_jaccard",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
        WHERE len(ws) >= 3
    ), sh AS (
        -- stop-shingle cap, mirroring jaccard_pairs(max_doc_freq=1000)
        SELECT doc_id, shingle FROM sh0
        QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.15
    """,
)
def q_llm_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via a shingle inverted index
    (SURVEY §2.J5 exact variant) — distributed as explode → self-join
    on shingle → count, never a full doc×doc product."""
    from clickhub_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        k=3,
        threshold=0.15,
        max_doc_freq=1000,
    )


@query("q_llm_dedup_minhash", oracle=None)  # xxhash64 is engine-internal
def q_llm_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (SURVEY §2.J5): 32-perm
    signatures, 8 bands — the scale path where exact Jaccard's
    inverted index would blow up.  Rows-only check (engine-internal
    xxhash64); unit test validates against exact Jaccard."""
    from clickhub_spark.operators.dedup import minhash_candidate_pairs

    return minhash_candidate_pairs(
        load(spark, sf_dir, "documents"), "text", "doc_id", k=3, num_perm=32, bands=8
    )


# ---------------------------------------------------------------------------
# Similarity search (§2.J6)
# ---------------------------------------------------------------------------


@query(
    "q_llm_knn",
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
def q_llm_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0 (SURVEY §2.J6
    baseline).  Scoring is a zip_with/aggregate codegen expression;
    top-k is TakeOrderedAndProject — no full sort, no Python."""
    from clickhub_spark.operators.knn import brute_force_topk

    return brute_force_topk(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


@query("q_llm_knn_lsh", oracle=None)  # LSH planes are engine-internal
def q_llm_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH bucketing — the scale path
    (scan pruned to the query's bucket plus its n_bits Hamming-1
    neighbors; multi_probe=1 is the configuration whose recall
    q_llm_knn_lsh_recall certifies — ADVICE r9 #3 aligned the serving
    path with the certificate).  Rows-only check; unit test measures
    recall against q_llm_knn."""
    from clickhub_spark.operators.knn import lsh_bucket_topk

    return lsh_bucket_topk(
        load(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        n_bits=4,
        multi_probe=1,
    )


# ---------------------------------------------------------------------------
# Text analysis (§2.J7)
# ---------------------------------------------------------------------------

_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

#: shared oracle fragment: the md5 MinHash-LSH candidate-pair CTE
#: chain (kept single-source so the Spark pipeline and every oracle
#: that builds on it change together).
_MINHASH_PAIRS_CTE = """
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
    )
"""



@query(
    "q_llm_textstats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_fn,
           ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    """,
)
def q_llm_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats per document (SURVEY §2.J7) —
    whitespace tokenizer, all builtin fns."""
    toks = F.size(F.split("text", " "))
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        toks.alias("n_tokens"),
        F.length("text").alias("n_chars_fn"),
        F.round(
            (F.length("text") - (toks - 1)).cast("double") / toks, 4
        ).alias("avg_token_len"),
    )


@query(
    "q_llm_lang_id",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    )
    SELECT doc_id, any_value(lang) AS lang,
           ROUND(AVG(CASE WHEN w IN {_EN_STOPWORDS} THEN 1.0 ELSE 0.0 END), 4)
               AS stopword_ratio,
           CASE WHEN AVG(CASE WHEN w IN {_EN_STOPWORDS} THEN 1.0 ELSE 0.0 END) > 0.05
                THEN 'en' ELSE 'other' END AS pred_lang
    FROM toks GROUP BY doc_id
    """,
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID via stopword-hit ratio (SURVEY north-star
    text analysis) — explode + isin + avg, no UDF."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    hit = F.when(F.col("w").isin(*_EN_STOPWORDS), 1.0).otherwise(0.0)
    return toks.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.round(F.avg(hit), 4).alias("stopword_ratio"),
        F.when(F.avg(hit) > 0.05, "en").otherwise("other").alias("pred_lang"),
    )


@query(
    "q_llm_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), stats AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(CAST(COUNT(DISTINCT w) AS DOUBLE) / COUNT(*), 4) AS distinct_ratio
        FROM toks GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_tokens, s.distinct_ratio,
           CASE WHEN s.n_tokens >= 20 AND s.distinct_ratio >= 0.3
                THEN 'good' ELSE 'low' END AS quality
    FROM stats s
    """,
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length + lexical-diversity gates
    (SURVEY north-star quality scoring)."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    stats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.countDistinct("w").cast("double") / F.count("*"), 4).alias(
            "distinct_ratio"
        ),
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        "distinct_ratio",
        F.when(
            (F.col("n_tokens") >= 20) & (F.col("distinct_ratio") >= 0.3), "good"
        )
        .otherwise("low")
        .alias("quality"),
    )


@query(
    "q_llm_fingerprint",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
        WHERE len(ws) >= 3
    )
    SELECT doc_id, min(md5(shingle)) AS fingerprint
    FROM sh GROUP BY doc_id
    """,
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: bottom-1 sketch over hashed 3-gram
    shingles (winnowing-style; SURVEY north-star fingerprinting).
    Docs sharing a fingerprint are near-dup candidates."""
    from clickhub_spark.operators.dedup import shingles

    sh = shingles(load(spark, sf_dir, "documents"), "text", "doc_id", k=3)
    return sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# UDF / UDAF / UDTF surface (§2.J1-J3)
# ---------------------------------------------------------------------------


@query(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_udf
    FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized, SURVEY §2.J1) — token count
    in Python as the UDF-surface demonstrator (the builtin form is
    q_llm_textstats; this proves the Arrow batch path)."""

    @pandas_udf("int")
    def n_tokens_udf(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int32")

    return load(spark, sf_dir, "documents").select(
        "doc_id", n_tokens_udf("text").alias("n_tokens_udf")
    )


@query(
    "q_udf_agg",
    oracle="""
    SELECT lang, ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS mean_chars
    FROM documents GROUP BY lang
    """,
)
def q_udf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf (UDAF surface, SURVEY §2.J2)."""

    @pandas_udf("double")
    def mean_chars(n: pd.Series) -> float:
        return float(n.astype("float64").mean())

    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.round(mean_chars("n_chars"), 4).alias("mean_chars"))
    )


@query(
    "q_udf_table",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS pos, string_split(text, ' ')[i] AS word
    FROM documents, UNNEST(range(1, 4)) t(i)
    WHERE len(string_split(text, ' ')) >= 3
    """,
)
def q_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function surface (UDTF, SURVEY §2.J3): one row → many via
    mapInPandas — emits the first 3 words per document with positions."""

    def first_words(batches):
        for pdf in batches:
            words = pdf["text"].str.split(" ")
            keep = words.str.len() >= 3
            pdf = pdf[keep]
            words = words[keep]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(3).values,
                    "pos": [p for _ in range(len(pdf)) for p in (1, 2, 3)],
                    "word": [w[p] for w in words for p in (0, 1, 2)],
                }
            )
            out["pos"] = out["pos"].astype("int32")
            yield out

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(first_words, "doc_id long, pos int, word string")


# ---------------------------------------------------------------------------
# Multimodal plumbing (north star) — binary columns + typed metadata
# ---------------------------------------------------------------------------


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS content_md5,
           'utf8-text' AS media_type
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing (SURVEY north star): treat payloads
    as opaque binary + typed metadata.  The testdata has no real
    image/audio bytes, so the binary column is derived (utf-8 encode);
    the decode/feature-extract path is operators/multimodal.py
    (mapInPandas, stubbed decode, tested batch shape)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.lit("utf8-text").alias("media_type"),
    )


@query(
    "q_multimodal_resize",
    oracle="""
    SELECT doc_id,
           repeat(substr(md5(text), 1, 6) || substr(md5(text), 1, 6)
               || substr(md5(text), 7, 6) || substr(md5(text), 7, 6), 2)
        || repeat(substr(md5(text), 13, 6) || substr(md5(text), 13, 6)
               || substr(md5(text), 19, 6) || substr(md5(text), 19, 6), 2)
           AS px_hex,
           4 AS width, 4 AS height
    FROM documents
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, oracle-checked end to end: each doc gets a
    2x2 24-bit BMP whose pixels are the first 12 bytes of md5(text)
    (deterministic — the testdata ships no real media bytes), the BMP
    runs the production ``resize_images`` pass (decode_bmp →
    nearest-neighbor resample → encode_bmp, operators/multimodal.py),
    and the resized payload is decoded BACK to its RGB buffer.  The
    oracle reproduces the expected 4x4 pixel hex with pure string ops
    on md5(text) — nearest-neighbor 2x2→4x4 duplicates each source
    pixel into a 2x2 block — so the whole decode/resample/re-encode
    round trip is value-verified by an independent engine.  At 100 TB
    the shape is identical: binary column in, mapInPandas per Arrow
    batch, small fixed-width outputs; only the payload source changes."""
    from clickhub_spark.operators.multimodal import decode_bmp, encode_bmp, resize_images

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.md5("text")).alias("m")
    )

    def make_bmp(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_bmp(2, 2, bytes(m)[:12]) for m in pdf["m"]],
                }
            )

    payloads = docs.mapInPandas(make_bmp, "doc_id long, payload binary")
    resized = resize_images(payloads, width=4, height=4)

    def to_pixels(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "px_hex": [decode_bmp(bytes(r))[3].hex() for r in pdf["resized"]],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return resized.mapInPandas(
        to_pixels, "doc_id long, px_hex string, width int, height int"
    )


@query(
    "q_multimodal_frames",
    oracle="""
    SELECT d.doc_id, f.frame_idx,
           substr(repeat(md5(d.text), 6), f.frame_idx * 32 + 1, 32) AS pcm_hex,
           60 AS wav_bytes
    FROM documents d
    CROSS JOIN (SELECT unnest([0, 2, 4]) AS frame_idx) f
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame sampling, oracle-checked: each doc gets an
    8-bit mono PCM WAV whose 96 data bytes are md5(text) repeated 6x,
    the production ``sample_frames`` pass slices it into 16-byte
    sample-aligned windows, keeps every 2nd up to 3, and re-encodes
    each window as a standalone WAV (operators/multimodal.py
    sample_wav_frames/encode_wav).  The output projects each frame's
    PCM chunk back out as hex (the 44-byte canonical header offset) +
    the total WAV size, which the oracle reproduces with substr over
    repeat(md5(text), 6) — frame extraction verified value-for-value
    by an independent engine, one row → many (UDTF shape)."""
    from clickhub_spark.operators.multimodal import encode_wav, sample_frames

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.md5("text")).alias("m")
    )

    def make_wav(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_wav(8000, 1, 8, bytes(m) * 6) for m in pdf["m"]
                    ],
                }
            )

    payloads = docs.mapInPandas(make_wav, "doc_id long, payload binary")
    frames = sample_frames(payloads, every_nth=2, max_frames=3, frame_sz=16)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.lower(F.hex(F.substring("frame", 45, 16))).alias("pcm_hex"),
        F.octet_length("frame").alias("wav_bytes"),
    )


@query(
    "q_llm_token_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')
                ) AS INT) AS n_tokens_bpe,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_ws
    FROM documents
    """,
)
def q_llm_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization vs whitespace (SURVEY north-star
    token counting): alpha runs, digit runs, and lone symbols — the
    pre-tokenizer split GPT-style BPE vocabularies assume.  Pure
    regexp_count, stays in codegen."""
    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).alias("n_tokens_bpe"),
        F.size(F.split("text", " ")).alias("n_tokens_ws"),
    )


@query(
    "q_llm_dedup_minhash_md5",
    oracle=_MINHASH_PAIRS_CTE + "SELECT id_a, id_b FROM pairs",
)
def q_llm_dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs with engine-portable md5 hashing —
    the fully oracle-checked variant of q_llm_dedup_minhash (16 perms,
    4 bands of 4).  Proves the banding/bucketing pipeline itself, not
    just its row count."""
    from clickhub_spark.operators.dedup import minhash_candidate_pairs_md5

    return minhash_candidate_pairs_md5(
        load(spark, sf_dir, "documents"), "text", "doc_id", k=3, num_perm=16, bands=4
    )


@query(
    "q_llm_dedup_groups",
    oracle=_MINHASH_PAIRS_CTE
    + """
    , bidir AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM bidir
            UNION
            SELECT r.src, e.b FROM r JOIN bidir e ON r.dst = e.a
        ) SELECT * FROM r
    ), comp AS (
        SELECT src AS node, least(src, min(dst)) AS comp
        FROM reach GROUP BY src
    )
    SELECT comp AS component, COUNT(*) AS n_members,
           min(node) AS canonical_id
    FROM comp GROUP BY comp
    """,
)
def q_llm_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS: connected components over the oracle-checkable
    md5 MinHash-LSH candidate pairs — the step that turns pairwise
    output into droppable duplicate clusters (keep canonical_id, drop
    the rest).  Spark side: iterative min-label propagation
    (operators/components.py); oracle side: recursive-CTE transitive
    closure — two completely different algorithms, same fixpoint."""
    from clickhub_spark.operators.components import dedup_groups
    from clickhub_spark.operators.dedup import minhash_candidate_pairs_md5

    pairs = minhash_candidate_pairs_md5(
        load(spark, sf_dir, "documents"), "text", "doc_id", k=3, num_perm=16, bands=4
    )
    return dedup_groups(pairs)


@query(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE WHEN lang = 'en' THEN '80' ELSE '1a' END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling for training-data balancing (north star):
    keep ~50% of 'en' docs and ~10% of everything else, selected by a
    hash of the id so the sample is deterministic, repeatable, and
    consistent across engines/runs (unlike rand()-based sampleBy).
    At 100 TB this is a single scan with a cheap predicate — no
    shuffle, no state."""
    rate = F.when(F.col("lang") == "en", F.lit("80")).otherwise(F.lit("1a"))
    return (
        load(spark, sf_dir, "documents")
        .where(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < rate)
        .select("doc_id", "lang")
    )


@query(
    "q_llm_dedup_apply",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars FROM documents d
    JOIN (
        SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)
    ) k ON d.doc_id = k.keep_id
    """,
)
def q_llm_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END PRODUCT: the corpus with exact duplicates dropped
    (keep the min-id member of every content-hash group) — what a
    training pipeline actually feeds downstream.  Semi-join against
    the canonical set; one hash shuffle + one join."""
    from clickhub_spark.operators.dedup import exact_dup_groups

    docs = load(spark, sf_dir, "documents")
    keep = exact_dup_groups(docs, "text", "doc_id").select(
        F.col("canonical_id").alias("keep_id")
    )
    return docs.join(
        keep, docs.doc_id == keep.keep_id, "left_semi"
    ).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# Pipeline filters: PII scrub, decontamination, repetition (§2.J7 extension)
# ---------------------------------------------------------------------------

#: Java∩RE2-portable patterns: email, phone-number shape, and a
#: denylist term standing in for a named-entity blocklist.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d[\d .-]{7,}\d"
_PII_DENY = r"\bcustomer\b"


@query(
    "q_llm_pii_scrub",
    oracle=rf"""
    WITH s1 AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{_PII_EMAIL}')) AS c1,
               regexp_replace(text, '{_PII_EMAIL}', '<REDACTED>', 'g') AS t
        FROM documents
    ), s2 AS (
        SELECT doc_id, c1,
               len(regexp_extract_all(t, '{_PII_PHONE}')) AS c2,
               regexp_replace(t, '{_PII_PHONE}', '<REDACTED>', 'g') AS t FROM s1
    ), s3 AS (
        SELECT doc_id, c1, c2,
               len(regexp_extract_all(t, '{_PII_DENY}')) AS c3,
               regexp_replace(t, '{_PII_DENY}', '<REDACTED>', 'g') AS t FROM s2
    )
    SELECT doc_id, CAST(c1 + c2 + c3 AS INT) AS n_redactions,
           md5(t) AS scrubbed_md5
    FROM s3
    """,
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data redaction pass): count + replace
    email/phone/denylist patterns per document in ONE map-only
    projection — regexp builtins in codegen, no shuffle, no UDF.
    Output carries md5(scrubbed) so the redacted text itself is
    value-checked cross-engine."""
    from clickhub_spark.operators.textops import scrub_patterns

    out = scrub_patterns(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        [_PII_EMAIL, _PII_PHONE, _PII_DENY],
    )
    return out.select(
        "doc_id", "n_redactions", F.md5("scrubbed").alias("scrubbed_md5")
    )


@query(
    "q_llm_contamination",
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
    """,
)
def q_llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥2 distinct
    3-gram shingles with the benchmark slice (doc_id % 50 = 0 stands
    in for an eval suite).  The benchmark shingle set is BROADCAST —
    benchmarks are KB-MB against a TB-PB corpus — so the corpus side
    never shuffles for the join."""
    from clickhub_spark.operators.textops import contamination

    docs = load(spark, sf_dir, "documents")
    return contamination(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0),
        "text",
        "doc_id",
        k=3,
        min_shared=2,
    )


@query(
    "q_llm_repetition",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
        WHERE len(ws) >= 3
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           ROUND(1.0 - CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*), 4)
               AS rep_ratio
    FROM sh GROUP BY doc_id
    """,
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: duplicate 3-gram fraction
    per document (1 - distinct/total) — non-distinct shingle explode,
    one partial-aggregated shuffle on doc_id."""
    from clickhub_spark.operators.textops import repetition_ratio

    return repetition_ratio(load(spark, sf_dir, "documents"), "text", "doc_id", k=3)


@query(
    "q_llm_dedup_incremental",
    oracle=_MINHASH_PAIRS_CTE
    + """
    SELECT id_a, id_b FROM pairs
    WHERE id_a % 10 = 0 OR id_b % 10 = 0
    """,
)
def q_llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup — the continuous-ingestion operating
    mode: the historical corpus' banded MinHash signatures live in a
    build-once store (written on first call, keyed on input files),
    and the NEW batch (doc_id % 10 = 0 stands in for today's crawl)
    only hashes itself, broadcasts against the store, and adds its
    within-batch pairs.  Value-equal to a from-scratch LSH run
    restricted to pairs involving the new batch — which is exactly
    what the oracle computes."""
    import os

    from clickhub_spark.artifacts import derived_artifact_path
    from clickhub_spark.operators.dedup import (
        incremental_candidate_pairs,
        write_minhash_store,
    )

    docs = load(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    new_batch = docs.where(F.col("doc_id") % 10 == 0)
    store = derived_artifact_path(docs, "minhash_store")
    if not os.path.isdir(store):
        from clickhub_spark.artifacts import prune_stale

        write_minhash_store(corpus, "text", "doc_id", store)
        prune_stale(store)  # drop stores of regenerated datasets
    return incremental_candidate_pairs(new_batch, store, "text", "doc_id")


@query(
    "q_llm_embed_centroid",
    oracle="""
    SELECT label, i - 1 AS pos,
           -- + 0 normalizes IEEE -0.0 (a tiny negative mean can
           -- round to negative zero in one engine and positive
           -- zero in the other)
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) + 0 AS v
    FROM embeddings, UNNEST(range(1, 65)) t(i)
    GROUP BY label, i
    """,
)
def q_llm_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (the coarse-quantizer / cluster-
    profile build, cross-engine-checkable unlike KMeans): posexplode
    to (label, pos, v), partial-aggregated mean per component.
    Map-side combine collapses each partition to labels×64 rows before
    the shuffle, so exchange volume is O(labels × dim × partitions)
    regardless of corpus size.  Output stays in the exploded
    (label, pos, v) scalar shape — driver-hashable (the round-2
    correctness driver cannot canonicalize array columns); callers
    wanting the assembled vector apply
    ``groupBy(label).agg(sort_array(collect_list(struct(pos, v))))``
    (exercised in tests/test_llm_ops.py).  The ``+ 0.0`` after
    rounding normalizes IEEE negative zero on both engines (found at
    sf0.1: a -0.00001 mean rounds to -0.0 in one engine and 0.0 in
    the other)."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg((F.round(F.avg(F.col("v").cast("double")), 4) + 0.0).alias("v"))
    )


@query(
    "q_llm_mixture",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN 'zzzz'    -- keep all
                    WHEN 'de' THEN '8000'    -- 1/2
                    WHEN 'fr' THEN '4000'    -- 1/4
                    ELSE '1000' END          -- 1/16
    """,
)
def q_llm_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus-mixture sampling (operators/textops.
    mixture_sample) — downsample per-source to target data-mixing
    weights by md5-prefix threshold: repeatable, joinable, map-only
    (no shuffle; prunable under bucketing).  en kept whole, de 1/2,
    fr 1/4, everything else 1/16."""
    from clickhub_spark.operators.textops import mixture_sample

    return mixture_sample(
        load(spark, sf_dir, "documents"),
        rates={"en": 1.0, "de": 0.5, "fr": 0.25},
        group_col="lang",
        key_col="doc_id",
        default_rate=1 / 16,
    ).select("doc_id", "lang", "source", "n_chars")


@query("q_llm_knn_pq", oracle=None)  # PQ codes: engine-internal quantization
def q_llm_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-20 (SURVEY §2.J6 scale path #3,
    operators/knn.build_pq_index): m-byte codes replace raw vectors
    (32× compression at m=8/dim=64), probes scan only the codes table
    with per-subspace lookup tables.

    Serves the certified TWO-STAGE path (VERDICT r14 item 5): ADC
    top-200 candidates, exact cosine re-rank to top-20 — single-stage
    ADC rank quality decays with corpus size (its 0.35 recall floor
    failed at 10M vectors, ANN_SCALE_r14, while two-stage held ≥0.6),
    so the registered query is the production serving shape and the
    raw ADC path remains only as the recall-certification probe
    (q_llm_knn_pq_recall, tests/test_approx.py).  Rows-only:
    quantized candidate selection is engine-internal; sims of the
    final top-20 are exact cosine."""
    from clickhub_spark.operators.knn import pq_topk

    return pq_topk(
        load(spark, sf_dir, "embeddings"),
        query_id=0,
        k=20,
        m=16,
        n_codes=32,
        rerank=200,
    )


@query(
    "q_llm_chunk",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), starts AS (
        SELECT doc_id, ws, s
        FROM words, UNNEST(range(0, len(ws), 30)) t(s)
        WHERE s = 0 OR s + 10 < len(ws)
    )
    SELECT doc_id, CAST(s AS INT) AS chunk_start,
           CAST(len(ws[s + 1 : s + 40]) AS INT) AS n_chunk_tokens,
           md5(array_to_string(ws[s + 1 : s + 40], ' ')) AS chunk_md5
    FROM starts
    """,
)
def q_llm_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (40-token chunks, 10-token
    overlap) — the pre-embedding prep step; map-only builtins, chunk
    content value-checked via md5."""
    from clickhub_spark.operators.textops import chunk_documents

    out = chunk_documents(
        load(spark, sf_dir, "documents"), "text", "doc_id", chunk_tokens=40, overlap=10
    )
    return out.select(
        "doc_id",
        F.col("chunk_start").cast("int").alias("chunk_start"),
        "n_chunk_tokens",
        F.md5("chunk").alias("chunk_md5"),
    )


@query(
    "q_llm_dedup_apply_near",
    oracle=_MINHASH_PAIRS_CTE
    + """
    , bidir AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM bidir
            UNION
            SELECT r.src, e.b FROM r JOIN bidir e ON r.dst = e.a
        ) SELECT * FROM r
    ), comp AS (
        SELECT src AS node, least(src, min(dst)) AS comp
        FROM reach GROUP BY src
    )
    SELECT d.doc_id, d.lang, d.n_chars FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> comp)
    """,
)
def q_llm_dedup_apply_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dedup END PRODUCT: the corpus with non-canonical
    members of every near-dup cluster dropped (exact-dup apply is
    q_llm_dedup_apply; this is the fuzzy counterpart a training
    pipeline actually ships).  LSH pairs → connected components →
    anti-join of the non-canonical node set."""
    from clickhub_spark.operators.components import connected_components
    from clickhub_spark.operators.dedup import minhash_candidate_pairs_md5

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs_md5(docs, "text", "doc_id", k=3, num_perm=16, bands=4)
    drop = (
        connected_components(pairs)
        .where(F.col("node") != F.col("comp"))
        .select(F.col("node").alias("doc_id"))
    )
    return docs.join(drop, "doc_id", "left_anti").select("doc_id", "lang", "n_chars")


@query(
    "q_llm_pack",
    oracle="""
    WITH sized AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), runs AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM sized
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS bin_id
    FROM runs
    """,
)
def q_llm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training (context-window fill): documents
    in deterministic order are assigned to 2048-token bins by running
    token count — the standard streaming pack that turns a ragged
    corpus into fixed-budget training sequences.

    Scale note: a single global running sum is an anti-pattern at
    100 TB (one ordered partition); the production form packs within
    shards (partitionBy(shard) windows) since bins never need to span
    shards — the global form here is the cross-engine-checkable
    semantics on one window."""
    from pyspark.sql.window import Window

    sized = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return sized.select(
        "doc_id",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048).alias("bin_id"),
    )


@query(
    "q_llm_corpus_pipeline",
    oracle=_MINHASH_PAIRS_CTE
    + """
    , bidir AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(src, dst) AS (
            SELECT a, b FROM bidir
            UNION
            SELECT r.src, e.b FROM r JOIN bidir e ON r.dst = e.a
        ) SELECT * FROM r
    ), comp AS (
        SELECT src AS node, least(src, min(dst)) AS comp
        FROM reach GROUP BY src
    ), toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), quality AS (
        SELECT doc_id FROM toks GROUP BY doc_id
        HAVING COUNT(*) >= 20
           AND CAST(COUNT(DISTINCT w) AS DOUBLE) / COUNT(*) >= 0.3
    ), bench_sh AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    ), contaminated AS (
        SELECT c.doc_id FROM sh c JOIN bench_sh b USING (shingle)
        WHERE c.doc_id % 50 <> 0
        GROUP BY c.doc_id HAVING COUNT(*) >= 2
    )
    SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens
    FROM documents d
    WHERE d.doc_id % 50 <> 0                                   -- not eval data
      AND d.doc_id IN (SELECT doc_id FROM quality)             -- quality gate
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)    -- decontaminated
      AND d.doc_id NOT IN (SELECT node FROM comp WHERE node <> comp)  -- near-dedup
    """,
)
def q_llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END pretraining corpus filter — what actually ships
    to the tokenizer: drop the eval slice, gate on quality
    (length + lexical diversity), remove benchmark-contaminated docs
    (broadcast shingle join), and keep only near-dup canonicals (LSH →
    connected components).  One composed plan: every stage is an
    already-verified operator; this query verifies their COMPOSITION
    end-to-end against a single oracle."""
    from clickhub_spark.operators.components import connected_components
    from clickhub_spark.operators.dedup import minhash_candidate_pairs_md5
    from clickhub_spark.operators.textops import contamination

    docs = load(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    bench = docs.where(F.col("doc_id") % 50 == 0)

    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    quality = (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.count_distinct("w").alias("d"))
        .where((F.col("n") >= 20) & (F.col("d").cast("double") / F.col("n") >= 0.3))
        .select("doc_id")
    )
    contaminated = contamination(corpus, bench, "text", "doc_id", k=3, min_shared=2) \
        .select("doc_id")
    pairs = minhash_candidate_pairs_md5(docs, "text", "doc_id", k=3, num_perm=16, bands=4)
    non_canonical = (
        connected_components(pairs)
        .where(F.col("node") != F.col("comp"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        corpus.join(quality, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .join(non_canonical, "doc_id", "left_anti")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    )


@query(
    "q_llm_dedup_substring",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), pg AS (
        SELECT doc_id, i - 1 AS pos, array_to_string(ws[i:i+7], ' ') AS g
        FROM words, UNNEST(range(1, len(ws) - 6)) t(i)
        WHERE len(ws) >= 8
    ), viral AS (
        SELECT g FROM (
            SELECT g, COUNT(DISTINCT doc_id) AS df FROM pg GROUP BY g
        ) WHERE df > 1000
    ), capped AS (
        SELECT doc_id, pos, g FROM pg WHERE g NOT IN (SELECT g FROM viral)
    ), m AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
        FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
    ), runs AS (
        SELECT id_a, id_b, pa - pb AS diag, COUNT(*) AS n,
               MIN(pa) AS a_start, MAX(pa) AS a_end
        FROM m GROUP BY id_a, id_b, pa - pb
    )
    SELECT id_a, id_b, CAST(a_start AS INT) AS a_start,
           CAST(a_start - diag AS INT) AS b_start,
           CAST(n + 7 AS BIGINT) AS span_len
    FROM runs
    WHERE n = a_end - a_start + 1 AND n + 7 >= 12
    """,
)
def q_llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document substring duplication ≥12 tokens — the
    suffix-array dedup family (verbatim overlaps that bag-of-shingles
    similarity underweights), distributed as 8-gram diagonal runs
    (operators/dedup.substring_dup_spans).  The output carries only
    positions and span lengths, so it is value-checkable even though
    the Spark side joins on word-hash grams and the oracle on gram
    strings."""
    from clickhub_spark.operators.dedup import substring_dup_spans

    out = substring_dup_spans(
        load(spark, sf_dir, "documents"), "text", "doc_id", k=8, min_len=12
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("a_start").cast("int").alias("a_start"),
        F.col("b_start").cast("int").alias("b_start"),
        "span_len",
    )


# Shared by q_llm_perplexity (inline training) and
# q_llm_perplexity_store (persisted-store scoring): the two MUST be
# value-identical, which is exactly what one oracle checking both
# proves.
_PERPLEXITY_ORACLE = """
    WITH toked AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ), bg AS (
        SELECT doc_id, u.pair[1] AS prev, u.pair[2] AS w
        FROM toked,
             UNNEST(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) u(pair)
        WHERE len(toks) >= 2
    ), cbw AS (
        SELECT prev, w, COUNT(*) AS cbw FROM bg GROUP BY 1, 2
    ), cw AS (
        SELECT prev, COUNT(*) AS cw FROM bg GROUP BY 1
    ), v AS (
        SELECT COUNT(DISTINCT t.tok) AS v FROM toked, UNNEST(toks) t(tok)
    )
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-log2((c.cbw + 0.5) / (u.cw + 0.5 * v.v))), 4) AS bits
    FROM bg b JOIN cbw c USING (prev, w) JOIN cw u USING (prev), v
    GROUP BY b.doc_id
    """


@query("q_llm_perplexity", oracle=_PERPLEXITY_ORACLE)
def q_llm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus LM quality scoring (operators/lm.py): train
    an add-k-smoothed bigram model on the corpus, score every document
    by average bits per bigram (monotone in perplexity) — the filter
    stage that drops distribution-tail documents from training data.
    Bigram extraction is map-only (slice+zip, no token window); the
    model join is Catalyst-broadcastable because model size is bounded
    by observed vocabulary, not corpus size."""
    from clickhub_spark.operators.lm import score_bits, train_bigram_lm

    docs = load(spark, sf_dir, "documents")
    model = train_bigram_lm(docs, "text", "doc_id")
    scored = score_bits(docs, model, "text", "doc_id")
    return scored.select(
        "doc_id", "n_bigrams", F.round("bits", 4).alias("bits")
    )


@query("q_llm_perplexity_store", oracle=_PERPLEXITY_ORACLE)
def q_llm_perplexity_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-once/score-many perplexity (VERDICT r3 item 6): the model
    is persisted via write_lm_store (build-once artifact keyed on the
    corpus files + plan, like the minhash/IVF stores) and scoring runs
    score_against_store — only the three small model tables plus the
    scored batch are read.  Shares q_llm_perplexity's oracle, proving
    persisted-store scoring ≡ inline training bit-for-bit."""
    import os

    from clickhub_spark.artifacts import derived_artifact_path, prune_stale
    from clickhub_spark.operators.lm import (
        score_against_store,
        train_bigram_lm,
        write_lm_store,
    )

    docs = load(spark, sf_dir, "documents")
    path = derived_artifact_path(docs, "lm_store")
    if not os.path.isdir(f"{path}/vocab"):
        write_lm_store(train_bigram_lm(docs, "text", "doc_id"), path)
        prune_stale(path)
    scored = score_against_store(docs, path, "text", "doc_id")
    return scored.select(
        "doc_id", "n_bigrams", F.round("bits", 4).alias("bits")
    )


@query(
    "q_llm_vocab_coverage",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        FROM documents
    ), counts AS (
        SELECT t, COUNT(*) AS c FROM toks GROUP BY t
    ), vocab AS (
        SELECT t FROM counts ORDER BY c DESC, t ASC LIMIT 20
    )
    SELECT k.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS oov_rate
    FROM toks k LEFT JOIN vocab v USING (t)
    GROUP BY k.doc_id
    """,
)
def q_llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary coverage (operators/lm.py): build the
    top-20 corpus vocabulary (count DESC, token ASC — a TakeOrdered,
    never a global sort) and score every document's out-of-vocabulary
    rate against it via a broadcast probe.  This is the sizing loop a
    tokenizer-bound pipeline runs before fixing a vocab: at 100 TB the
    vocab stays top-k bounded and broadcastable, the probe is
    map-only, and the only shuffles are the token-count agg and the
    per-document rollup."""
    from clickhub_spark.operators.lm import build_vocab, oov_stats

    docs = load(spark, sf_dir, "documents")
    vocab = build_vocab(docs, "text", max_size=20)
    stats = oov_stats(docs, vocab, "text", "doc_id")
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
    )


@query(
    "q_llm_shuffle",
    oracle="""
    SELECT substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 2) AS shard,
           md5(CAST(doc_id AS VARCHAR) || ':42') AS pos_key,
           doc_id
    FROM documents
    """,
)
def q_llm_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (operators/textops.py):
    seeded md5 permutation key + hex-prefix shard, the training-order
    decorrelation step before sequence packing.  Map-only here; the
    write path range-partitions on (shard, pos_key) so each shard
    lands as one sorted file — a uniform random read order at 100 TB
    without a single-node global sort.  Seeded + engine-portable, so
    the oracle reproduces the exact permutation."""
    from clickhub_spark.operators.textops import deterministic_shuffle

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", seed="42", shard_bits=8)


@query(
    "q_llm_knn_lsh_md5",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sig AS (
        SELECT vec_id, v,
               CASE WHEN list_sum(list_transform(range(1, 65),
                    i -> v[i] * CASE WHEN substr(md5('0:' || (i - 1)), 1, 1) <= '7'
                                THEN 1.0 ELSE -1.0 END)) >= 0
               THEN '1' ELSE '0' END
            || CASE WHEN list_sum(list_transform(range(1, 65),
                    i -> v[i] * CASE WHEN substr(md5('1:' || (i - 1)), 1, 1) <= '7'
                                THEN 1.0 ELSE -1.0 END)) >= 0
               THEN '1' ELSE '0' END
            || CASE WHEN list_sum(list_transform(range(1, 65),
                    i -> v[i] * CASE WHEN substr(md5('2:' || (i - 1)), 1, 1) <= '7'
                                THEN 1.0 ELSE -1.0 END)) >= 0
               THEN '1' ELSE '0' END
            || CASE WHEN list_sum(list_transform(range(1, 65),
                    i -> v[i] * CASE WHEN substr(md5('3:' || (i - 1)), 1, 1) <= '7'
                                THEN 1.0 ELSE -1.0 END)) >= 0
               THEN '1' ELSE '0' END AS bucket
        FROM e
    )
    SELECT s.vec_id, ROUND(list_cosine_similarity(s.v, q.v), 4) AS sim, s.bucket
    FROM sig s, (SELECT v, bucket FROM sig WHERE vec_id = 0) q
    WHERE s.vec_id <> 0 AND s.bucket = q.bucket
    ORDER BY sim DESC, s.vec_id ASC LIMIT 10
    """,
)
def q_llm_knn_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable LSH ANN (SURVEY §2.J6 scale path): the md5-basis
    hyperplane twin of q_llm_knn_lsh — same bucket-pruned plan
    (map-only signatures, broadcast query row, candidates by bucket
    equality, TakeOrdered top-k), but the plane weights derive from an
    engine-portable md5 parity so DuckDB reproduces bucket AND
    similarity value-for-value.  Both engines fold the dot product
    sequentially over the array in index order, so the IEEE result is
    identical — the sign bit cannot disagree."""
    from clickhub_spark.operators.knn import lsh_bucket_topk_md5

    return lsh_bucket_topk_md5(
        load(spark, sf_dir, "embeddings"), query_id=0, k=10, n_bits=4
    )


@query(
    "q_llm_pack_sharded",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 2) AS shard,
               md5(CAST(doc_id AS VARCHAR) || ':42') AS pos_key,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), runs AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY pos_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM sized
    )
    SELECT doc_id, shard, CAST(n_tokens AS INT) AS n_tokens,
           CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS bin_id
    FROM runs
    """,
)
def q_llm_pack_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of sequence packing: q_llm_pack's global
    running sum is an anti-pattern at 100 TB (one ordered partition),
    so here the corpus is first decorrelated by the deterministic
    seeded shuffle (operators/textops.deterministic_shuffle) and then
    packed WITHIN each hash shard — the running-sum window partitions
    by shard, so 256 independent windows run in parallel and no
    single-node global order ever materializes.  Bins never need to
    span shards; training readers consume shards independently.  Fully
    oracle-checkable because the shuffle is a seeded md5 permutation."""
    from clickhub_spark.operators.textops import deterministic_shuffle
    from pyspark.sql.window import Window

    sized = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sharded = deterministic_shuffle(sized, "doc_id", seed="42", shard_bits=8)
    w = (
        Window.partitionBy("shard")
        .orderBy("pos_key")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return sharded.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048).alias("bin_id"),
    )


@query(
    "q_llm_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 4) < 'e666'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 4) < 'f333'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_llm_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split (operators/textops.
    split_corpus): seeded md5-prefix assignment, map-only, stable under
    corpus growth — adding documents never moves an existing one across
    the split boundary, which is what keeps dataset-version N's test
    set uncontaminated by version N+1's training set.  The oracle
    reproduces the exact assignment."""
    from clickhub_spark.operators.textops import split_corpus

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return split_corpus(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}, "doc_id", seed="7"
    )
