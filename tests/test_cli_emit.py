"""CLI output formats (≙ clickhouse-client FORMAT CSV/TSV/JSONEachRow):
delimiter, quote, and newline bytes inside values must survive the
round trip, not corrupt row framing."""

import csv
import io
import json


def test_emit_csv_escapes_delimiters_quotes_newlines(spark, capsys):
    from clickhub_spark.__main__ import _emit

    df = spark.createDataFrame(
        [(1, 'has,comma and "quote"'), (2, "has\nnewline"), (3, None)],
        "id long, name string",
    )
    _emit(df.orderBy("id"), limit=0, fmt="csv")
    out = capsys.readouterr().out
    parsed = list(csv.reader(io.StringIO(out)))
    assert parsed[0] == ["id", "name"]
    assert parsed[1] == ["1", 'has,comma and "quote"']
    assert parsed[2] == ["2", "has\nnewline"]
    assert parsed[3] == ["3", ""]


def test_emit_tsv_and_json(spark, capsys):
    from clickhub_spark.__main__ import _emit

    df = spark.createDataFrame([(1, "tab\there")], "id long, name string")
    _emit(df, limit=0, fmt="tsv")
    tsv = capsys.readouterr().out
    parsed = list(csv.reader(io.StringIO(tsv), delimiter="\t"))
    assert parsed[1] == ["1", "tab\there"]
    _emit(df, limit=0, fmt="json")
    line = capsys.readouterr().out.strip()
    assert json.loads(line) == {"id": 1, "name": "tab\there"}
