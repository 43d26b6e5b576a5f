"""engine_tsv custom sink (sources/pyds.TsvSinkWriter): atomic
commit, round-trip through the positional TSV reader, overwrite
semantics, and no-partial-output on job failure."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from clickhub_spark.sources.pyds import register_sources
from clickhub_spark.sources.tsv import read_positional_tsv
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _register(spark):
    register_sources(spark)


def _docs_proj(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars", F.md5("text").alias("text_md5"))
    )


_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def test_round_trip_through_positional_reader(spark, tmp_path):
    out = str(tmp_path / "docs_tsv")
    os.makedirs(out)
    df = _docs_proj(spark)
    df.repartition(4).write.format("engine_tsv").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    parts = [f for f in os.listdir(out) if f.endswith(".tsv")]
    assert len(parts) == 4  # one committed file per task
    back = read_positional_tsv(spark, out, _SCHEMA)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # _SUCCESS carries the committed row count
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == len(a)
    # staging fully cleaned
    assert not [d for d in os.listdir(out) if d.startswith(".staging-")]


def test_overwrite_replaces_previous_files(spark, tmp_path):
    out = str(tmp_path / "ow")
    os.makedirs(out)
    big = _docs_proj(spark)
    big.repartition(8).write.format("engine_tsv").option("path", out).mode("append").save()
    small = big.limit(10).repartition(1)
    small.write.format("engine_tsv").option("path", out).mode("overwrite").save()
    back = read_positional_tsv(spark, out, _SCHEMA)
    assert back.count() == 10


def test_failed_job_leaves_no_partial_output(spark, tmp_path):
    out = str(tmp_path / "fail")
    os.makedirs(out)

    @F.udf("long")
    def boom(v):
        if v is not None and v % 97 == 13:
            raise RuntimeError("injected task failure")
        return v

    df = _docs_proj(spark).withColumn("doc_id", boom("doc_id"))
    with pytest.raises(Exception):
        df.repartition(4).write.format("engine_tsv").option("path", out).mode("append").save()
    # abort removed staging; nothing committed
    assert [f for f in os.listdir(out) if f.endswith(".tsv")] == []
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [d for d in os.listdir(out) if d.startswith(".staging-")]


def test_null_encoding(spark, tmp_path):
    out = str(tmp_path / "nulls")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(1, None), (2, "x")], "id BIGINT, s STRING"
    )
    df.repartition(1).write.format("engine_tsv").option("path", out).mode("append").save()
    part = [f for f in os.listdir(out) if f.endswith(".tsv")][0]
    lines = sorted(open(os.path.join(out, part)).read().splitlines())
    assert lines == ["1\t\\N", "2\tx"]


def test_hostile_values_round_trip_exactly(spark, tmp_path):
    """Round-12 review findings: (1) the readers run UNQUOTED — a
    value merely BEGINNING with a double quote must not be
    quote-parsed (stripped quote / swallowed tab); (2) backslashes
    are escaped on write and unescaped on read, so a genuine string
    value of exactly '\\N' survives instead of round-tripping as
    NULL, while a real NULL still does."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from clickhub_spark.sources.tsv import (
        read_positional_tsv,
        read_positional_tsv_tolerant,
    )

    schema = StructType(
        [StructField("s", StringType()), StructField("n", LongType())]
    )
    rows = [
        ('"quoted start', 1),
        ("\\N", 2),  # the literal two-char string, NOT a null
        ("C:\\path\\to", 3),
        (None, 4),  # a real null
        ('"fully quoted"', 5),
        ('mid"quote', 6),
    ]
    out = str(tmp_path / "hostile")
    os.makedirs(out)
    spark.createDataFrame(rows, schema).coalesce(1).write.format(
        "engine_tsv"
    ).option("path", out).mode("append").save()
    want = sorted(rows, key=lambda r: r[1])
    got = read_positional_tsv(spark, out, schema).orderBy("n").collect()
    assert [(r.s, r.n) for r in got] == want
    got_tol = (
        read_positional_tsv_tolerant(spark, out, schema)
        .orderBy("n")
        .collect()
    )
    assert [(r.s, r.n) for r in got_tol] == want


def test_append_twice_accumulates(spark, tmp_path):
    # part file names are job-unique: a second append must never
    # rename over the first job's files
    out = str(tmp_path / "ap2")
    os.makedirs(out)
    ten = _docs_proj(spark).limit(10).repartition(1)
    ten.write.format("engine_tsv").option("path", out).mode("append").save()
    ten.write.format("engine_tsv").option("path", out).mode("append").save()
    assert len([f for f in os.listdir(out) if f.endswith(".tsv")]) == 2
    assert read_positional_tsv(spark, out, _SCHEMA).count() == 20


def test_commit_fails_fast_on_invisible_staged_part(tmp_path):
    # ADVICE r5: staged parts live on executor-local disk; when the
    # driver can't see one (no shared filesystem), commit must fail
    # BEFORE deleting old output or renaming any part.
    from pyspark.sql.types import StructField

    from clickhub_spark.sources.pyds import TsvSinkWriter, _TsvCommit

    target = tmp_path / "out"
    target.mkdir()
    (target / "old.tsv").write_text("1\tkeep\n")
    schema = StructType([StructField("a", StringType())])
    w = TsvSinkWriter({"path": str(target)}, schema, overwrite=True)
    stage = target / f".staging-{w.job_id}"
    stage.mkdir()
    visible = stage / "part-ok.tsv"
    visible.write_text("2\tnew\n")
    msgs = [
        _TsvCommit(str(visible), 1),
        _TsvCommit(str(stage / "part-on-another-node.tsv"), 1),
    ]
    with pytest.raises(FileNotFoundError, match="share one filesystem"):
        w.commit(msgs)
    # nothing renamed, overwrite did NOT clear the old data
    assert (target / "old.tsv").read_text() == "1\tkeep\n"
    assert visible.exists() and not (target / "part-ok.tsv").exists()


def test_null_round_trip_through_positional_reader(spark, tmp_path):
    # round-6 review: the sink writes NULL as the ClickHouse \N marker
    # but the readers never translated it back — a null long aborted
    # the read under ANSI cast, a null string came back as '\N'
    from pyspark.sql.types import LongType

    target = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, None, None), (2, "ok", 5)],
        "id long, s string, v long",
    )
    df.write.format("engine_tsv").option("path", target).mode("append").save()
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("s", StringType()),
            StructField("v", LongType()),
        ]
    )
    rows = {r.id: r for r in read_positional_tsv(spark, target, schema).collect()}
    assert rows[1].s is None and rows[1].v is None
    assert rows[2].s == "ok" and rows[2].v == 5
    # tolerant reader: a \N cell is a legitimate null, never "bad"
    from clickhub_spark.sources.tsv import read_positional_tsv_tolerant

    rows = {
        r.id: r
        for r in read_positional_tsv_tolerant(spark, target, schema).collect()
    }
    assert len(rows) == 2 and rows[1].v is None
