"""Git-history producer (SURVEY §2.A5): the reference delegates TSV
production to the external ``clickhouse git-import`` binary
(repo/importer.py:86-90); ours must emit the same positional layout
(types.json:6,12) from a real repository, offline."""

import subprocess

from clickhub_spark.catalog import COMMITS_SCHEMA, FILE_CHANGES_SCHEMA
from clickhub_spark.sources.git_extract import (
    clone,
    extract_git_history,
    parse_history,
)
from clickhub_spark.sources.tsv import read_positional_tsv


def _mkrepo(tmp_path):
    repo = str(tmp_path / "src")
    subprocess.run(["git", "init", "-q", repo], check=True)

    def sh(*args):
        subprocess.run(["git", *args], cwd=repo, check=True, capture_output=True)

    sh("config", "user.email", "t@e.st")
    sh("config", "user.name", "Test Er")
    (tmp_path / "src" / "a.py").write_text("one\ntwo\nthree\n")
    sh("add", ".")
    sh("commit", "-qm", "add a")
    sh("mv", "a.py", "b.py")
    (tmp_path / "src" / "b.py").write_text("one\ntwo\nthree\nfour\n")
    sh("add", ".")
    sh("commit", "-qm", "rename\tand grow")  # tab in message
    (tmp_path / "src" / "img.bin").write_bytes(b"bin\x00ary")
    sh("add", ".")
    sh("commit", "-qm", "binary file")
    return repo


def test_parse_history_statuses_counts_and_sanitization(tmp_path):
    from clickhub_spark.sources.git_extract import git_log_raw

    repo = _mkrepo(tmp_path)
    commits, changes = parse_history(git_log_raw(repo))
    assert len(commits) == 3
    by_msg = {c[3]: c for c in commits}
    # tab in the message is sanitized to a space → framing stays 13 cols
    assert "rename and grow" in by_msg
    rename = by_msg["rename and grow"]
    assert rename[6] == 1  # files_renamed
    assert rename[8] == 1 and rename[9] == 0  # +1/-0 lines
    add = by_msg["add a"]
    assert add[4] == 1 and add[8] == 3  # files_added, lines_added
    binary = by_msg["binary file"]
    assert binary[4] == 1 and binary[8] == 0  # binary: counted file, 0 lines

    rrow = next(r for r in changes if r[0] == "Rename")
    assert (rrow[1], rrow[2], rrow[3]) == ("b.py", "a.py", "py")
    assert len(rrow) == 22  # c1..c22 layout


def test_numstat_brace_rename_resolution():
    from clickhub_spark.sources.git_extract import _resolve_numstat_path

    assert _resolve_numstat_path("a.py => b.py") == "b.py"
    assert _resolve_numstat_path("src/{old => new}/f.py") == "src/new/f.py"
    assert _resolve_numstat_path("src/{ => sub}/f.py") == "src/sub/f.py"
    assert _resolve_numstat_path("plain.py") == "plain.py"


def test_clone_extract_load_final_loop(spark, tmp_path):
    """The full reference lifecycle, offline: clone (local path) →
    extract TSVs → positional-cast load → incremental append → FINAL
    view (≙ clone → git-import → clickhouse-local cast → INSERT →
    ReplacingMergeTree read)."""
    from clickhub_spark.orchestrator import Orchestrator
    from clickhub_spark.queue import WorkQueue

    src = _mkrepo(tmp_path)
    workdir = clone(src, str(tmp_path / "clone"))
    tsvs = extract_git_history(workdir, str(tmp_path / "tsv"))

    commits = read_positional_tsv(
        spark, tsvs["commits"], COMMITS_SCHEMA, literals={"repo_name": "acme/src"}
    )
    assert commits.count() == 3
    assert [f.name for f in commits.schema.fields] == [f.name for f in COMMITS_SCHEMA.fields]
    fc = read_positional_tsv(
        spark, tsvs["file_changes"], FILE_CHANGES_SCHEMA, literals={"repo_name": "acme/src"}
    )
    assert fc.where(fc.change_type == "Rename").count() == 1
    assert {r.change_type for r in fc.collect()} <= {"Add", "Delete", "Modify", "Rename", "Copy", "Type"}

    orch = Orchestrator(
        spark, str(tmp_path / "commits_tbl"), WorkQueue(str(tmp_path / "queue"))
    )
    orch.add_new_repo("acme/src")
    done = orch.run_worker("w1", tsv_for=lambda repo: tsvs["commits"])
    assert done == ["acme/src"]
    assert orch.commits_final().count() == 3
    # idempotent re-import: nothing past the high-water mark
    assert orch.import_repo("acme/src", tsvs["commits"]) == 0


def test_empty_repo_yields_empty_tsvs(tmp_path):
    repo = str(tmp_path / "empty")
    subprocess.run(["git", "init", "-q", repo], check=True)
    tsvs = extract_git_history(repo, str(tmp_path / "out"))
    assert open(tsvs["commits"]).read() == ""
    assert open(tsvs["file_changes"]).read() == ""
