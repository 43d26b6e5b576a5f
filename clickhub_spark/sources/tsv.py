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
    raw = spark.read.csv(path, sep="\t", header=False, inferSchema=False)
    cols = [
        F.col(f"_c{i}").cast(f.dataType).alias(f.name) for i, f in enumerate(positional)
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
    (the errors-table pattern).  Detection is cast-based: a positional
    cell that casts to NULL while its raw text is non-null, or a
    missing trailing column, marks the row bad — computed row-local
    (map-only, no shuffle), so tolerance costs nothing at scale.
    String columns accept any bytes by definition, exactly like
    ClickHouse's String."""
    literals = literals or {}
    positional = [f for f in schema.fields if f.name not in literals]
    raw = spark.read.csv(path, sep="\t", header=False, inferSchema=False)
    bad = F.lit(False)
    for i, f in enumerate(positional):
        cell = F.col(f"_c{i}")
        if f.dataType.typeName() == "string":
            bad = bad | cell.isNull()  # column missing entirely
        else:
            # try_cast, not cast: ANSI mode makes a plain cast THROW on
            # the malformed cell we are trying to detect
            bad = bad | (cell.isNull() | cell.try_cast(f.dataType).isNull())
    flagged = raw.withColumn("__bad", bad)
    if quarantine:
        (
            flagged.where("__bad")
            .select(
                F.concat_ws("\t", *[F.col(c) for c in raw.columns]).alias("line")
            )
            .write.mode("append")
            .text(quarantine)
        )
    good = flagged.where(~F.col("__bad"))
    # try_cast in the projection too: the optimizer may evaluate the
    # cast before the __bad filter, and good rows cast losslessly
    cols = [
        F.col(f"_c{i}").try_cast(f.dataType).alias(f.name)
        for i, f in enumerate(positional)
    ]
    cols += [
        F.lit(v).cast(schema[name].dataType).alias(name) for name, v in literals.items()
    ]
    return good.select(*cols)
