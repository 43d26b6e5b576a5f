"""Positional-TSV ingest — the engine's analog of the reference's
types.json ingest statements (reference types.json:6,12,18: ``SELECT
c1::String as hash, …, '{repo_name}'::String as repo_name FROM
file('commits.tsv')``), executed via clickhouse-local in the
reference (repo/importer.py:106-108).

Design: schema-on-load with explicit positional cast + rename +
literal injection — never inference — mirroring ``load_types()``
(reference clickhub.py:63-69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_positional_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    literals: dict[str, str] | None = None,
) -> DataFrame:
    """Read a headerless TSV, casting positional columns ``_c0.._cN``
    (≙ ClickHouse ``c1..cN``) to ``schema``'s names/types in order.

    ``literals`` appends injected constant columns (the
    ``'{repo_name}'::String`` tail of the reference statement); a
    schema field whose name is in ``literals`` is filled from the
    literal, not a TSV column.
    """
    literals = literals or {}
    positional = [f for f in schema.fields if f.name not in literals]
    # nullValue \N: the ClickHouse TSV null marker this package's own
    # engine_tsv sink writes — without it a NULL round-trips as the
    # literal two-char string (or an ANSI cast error on typed columns).
    # quote="": the engine's TSV format is UNQUOTED — with Spark's
    # default quote char, a field that merely BEGINS with a double
    # quote gets quote-parsed (quote stripped, or the tab delimiter
    # swallowed until a closing quote, shifting every later column).
    raw = spark.read.csv(
        path, sep="\t", header=False, inferSchema=False,
        nullValue="\\N", quote="",
    )

    def decode(c, dt):
        # inverse of the sink's backslash escaping (string fields
        # only; numeric/time cells never contain backslashes).  The
        # null marker was already matched BEFORE unescaping, so an
        # escaped "\\N" cell correctly survives as the value "\N".
        if dt.typeName() == "string":
            return F.replace(c, F.lit("\\\\"), F.lit("\\"))
        return c

    cols = [
        decode(F.col(f"_c{i}"), f.dataType).cast(f.dataType).alias(f.name)
        for i, f in enumerate(positional)
    ]
    cols += [
        F.lit(v).cast(schema[name].dataType).alias(name) for name, v in literals.items()
    ]
    return raw.select(*cols)


def stamp_updated_at(df: DataFrame) -> DataFrame:
    """MATERIALIZED now() ingest-time column (reference README.md:132)
    — populated at write, doubles as the ReplacingMergeTree version."""
    return df.withColumn("updated_at", F.current_timestamp())


def validate_non_negative(df: DataFrame, *cols: str) -> DataFrame:
    """UInt ingest guard (SURVEY §7 M4 hard part #3): the reference's
    UInt32 columns are widened to LongType; enforce the unsigned
    contract at the boundary instead of the type system."""
    cond = None
    for c in cols:
        clause = F.col(c) >= 0
        cond = clause if cond is None else (cond & clause)
    return df.where(cond) if cond is not None else df


def validate_enum(df: DataFrame, col: str, labels: tuple[str, ...]) -> DataFrame:
    """Enum8 label validation (SURVEY §1.2): query-visible type is the
    label string; reject rows outside the declared label set."""
    return df.where(F.col(col).isin(*labels))


def read_positional_tsv_tolerant(
    spark: SparkSession,
    path: str,
    schema: StructType,
    literals: dict[str, str] | None = None,
    quarantine: str | None = None,
) -> DataFrame:
    """Error-tolerant variant of ``read_positional_tsv`` — the
    ``input_format_allow_errors_num`` analog: a malformed row (wrong
    column count, uncastable value in a non-string field) must not
    abort a multi-hour 100 TB ingest.

    Malformed rows are DROPPED from the result; with ``quarantine``
    set they are also written there as raw lines for offline repair
    (the errors-table pattern).  The line is read whole and split on
    tabs (TSV has no quoting — escaping, not quoting, is the format's
    rule), so the actual field COUNT is known per row: a row is bad
    when it has fewer fields than the schema (true truncation) or a
    non-string cell fails ``try_cast``.  A legitimately EMPTY string
    field is therefore kept as ``''`` — it is not confused with a
    missing trailing column the way a null-based check would (the CSV
    reader returns null for both).  All row-local, map-only, no
    shuffle: tolerance costs nothing at scale."""
    literals = literals or {}
    positional = [f for f in schema.fields if f.name not in literals]
    raw = spark.read.text(path)
    # limit -1 keeps trailing empty fields, so "a\tb\t" counts 3;
    # \N cells (the ClickHouse TSV null marker, written by the
    # engine_tsv sink) become real nulls, never "malformed"
    cells = F.transform(
        F.split(F.col("value"), "\t", -1),
        lambda c: F.when(c == "\\N", F.lit(None)).otherwise(c),
    )
    bad = F.size(cells) < len(positional)  # missing trailing column(s)
    for i, f in enumerate(positional):
        if f.dataType.typeName() != "string":
            # try_cast, not cast: ANSI mode makes a plain cast THROW on
            # the malformed cell we are trying to detect.  F.get, not
            # cells[i]: get returns NULL out-of-bounds even under ANSI,
            # so a truncated row survives regardless of whether the
            # size-check disjunct above short-circuits first (cells[i]
            # would throw INVALID_ARRAY_INDEX if evaluated).
            # a \N (null) cell is a LEGITIMATE value, not malformed —
            # only a present-but-uncastable cell flags the row
            cell = F.get(cells, i)
            bad = bad | (cell.isNotNull() & cell.try_cast(f.dataType).isNull())
    flagged = raw.withColumn("__cells", cells).withColumn("__bad", bad)
    if quarantine:
        flagged.where("__bad").select("value").write.mode("append").text(quarantine)
    good = flagged.where(~F.col("__bad"))
    cols = [
        (
            # unescape backslashes on string fields (inverse of the
            # sink's escaping; the null marker matched pre-unescape)
            F.replace(
                F.get(F.col("__cells"), i), F.lit("\\\\"), F.lit("\\")
            )
            if f.dataType.typeName() == "string"
            else F.get(F.col("__cells"), i).try_cast(f.dataType)
        ).alias(f.name)
        for i, f in enumerate(positional)
    ]
    cols += [
        F.lit(v).cast(schema[name].dataType).alias(name) for name, v in literals.items()
    ]
    return good.select(*cols)
