"""Table catalog — the analog of the reference's ``types.json`` schema
catalog (reference types.json:3-26, loaded by clickhub.py:63-69).

Two families of tables:

1. Driver testdata (TPC-H-ish star + events/documents/embeddings) at
   ``{sf_dir}/{name}.parquet`` — schemas fixed by the driver, we read
   them as-is (schema-on-read from parquet footers is exact).
2. Reference git-import tables (``commits``, ``file_changes``,
   ``line_changes`` — reference README.md:116-213) — declared here as
   explicit StructTypes for the TSV ingest path (sources/tsv.py),
   mirroring the positional-cast statements in reference types.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: tables the driver generates (TESTDATA.md); one parquet file each.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar table scan (SURVEY §2.A2) — parquet is our MergeTree.

    The driver's ``events.parquet`` stores TIMESTAMP(NANOS), which the
    Spark vectorized reader rejects outright; read nanos as long
    (legacy conf) and convert to a microsecond TimestampType column —
    the same ns→µs truncation DuckDB applies internally, so oracle
    comparisons agree.
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def _long(name: str) -> StructField:
    # ClickHouse UInt32 → widen to LongType to preserve range
    # (SURVEY §1.2; unsigned ints have no Spark equivalent).
    return StructField(name, LongType(), True)


#: git.commits — reference README.md:116-135, ingest cast reference
#: types.json:6 (positional c1..c13 + injected repo_name literal).
COMMITS_SCHEMA = StructType(
    [
        StructField("hash", StringType(), True),
        StructField("author", StringType(), True),
        StructField("time", TimestampType(), True),
        StructField("message", StringType(), True),
        _long("files_added"),
        _long("files_deleted"),
        _long("files_renamed"),
        _long("files_modified"),
        _long("lines_added"),
        _long("lines_deleted"),
        _long("hunks_added"),
        _long("hunks_removed"),
        _long("hunks_changed"),
        StructField("repo_name", StringType(), True),
    ]
)

#: Enum8 label maps (SURVEY §1.2) — query-visible type is the label
#: string; maps kept for ingest-time validation / compact storage.
CHANGE_TYPE_LABELS = ("Add", "Delete", "Modify", "Rename", "Copy", "Type")  # reference README.md:140
LINE_TYPE_LABELS = ("Empty", "Comment", "Punct", "Code")  # reference README.md:183
