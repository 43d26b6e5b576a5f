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
    commits, changes, line_rows = parse_history(git_log_raw(repo))
    assert len(commits) == 3
    by_msg = {c[3]: c for c in commits}
    # tab in the message is sanitized to a space → framing stays 13 cols
    assert "rename and grow" in by_msg
    rename = by_msg["rename and grow"]
    assert rename[6] == 1  # files_renamed
    assert rename[8] == 1 and rename[9] == 0  # +1/-0 lines
    assert rename[10] == 1  # hunks_added: the one pure-addition hunk
    add = by_msg["add a"]
    assert add[4] == 1 and add[8] == 3  # files_added, lines_added
    assert add[10] == 1  # one added hunk
    binary = by_msg["binary file"]
    assert binary[4] == 1 and binary[8] == 0  # binary: counted file, 0 lines
    assert binary[10:13] == [0, 0, 0]  # no hunks in a binary patch

    rrow = next(r for r in changes if r[0] == "Rename")
    assert (rrow[1], rrow[2], rrow[3]) == ("b.py", "a.py", "py")
    assert len(rrow) == 22  # c1..c22 layout
    assert rrow[6] == 1  # file hunks_added


def test_line_changes_rows_numbers_lineage_and_classification(tmp_path):
    from clickhub_spark.sources.git_extract import git_log_raw

    repo = _mkrepo(tmp_path)
    commits, _, line_rows = parse_history(git_log_raw(repo))
    assert all(len(r) == 37 for r in line_rows)  # c1..c37 layout
    by_commit: dict = {}
    for r in line_rows:
        by_commit.setdefault(r[27], []).append(r)  # c28 commit_message

    adds = sorted(by_commit["add a"], key=lambda r: r[2])
    assert [(r[0], r[2], r[9]) for r in adds] == [
        (1, 1, "one"), (1, 2, "two"), (1, 3, "three"),
    ]  # sign, line_number_new, content
    assert adds[0][12] == ""  # no prev commit for a brand-new file
    assert adds[0][11] == "Code"  # line_type
    assert adds[0][6] == 3 and adds[0][7] == 0  # hunk +3/-0

    grow = by_commit["rename and grow"]
    assert [(r[0], r[2], r[9]) for r in grow] == [(1, 4, "four")]
    # prev lineage: the rename's line rows point at the 'add a' commit
    add_hash = next(c[0] for c in commits if c[3] == "add a")
    assert grow[0][12] == add_hash
    assert grow[0][16] == "b.py" and grow[0][17] == "a.py"  # path, old_path


def test_control_bytes_in_content_do_not_misframe_blocks(tmp_path):
    """A patch line or commit subject containing raw \\x01/\\x02 bytes
    must not split or shift a commit block: the parser frames on
    newline+\\x02 and validates the 40-hex hash, so every real commit
    still parses with the right hash and counts."""
    from clickhub_spark.sources.git_extract import git_log_raw

    repo = _mkrepo(tmp_path)

    def sh(*args):
        subprocess.run(["git", *args], cwd=repo, check=True, capture_output=True)

    # file content with framing bytes mid-line AND at line start
    (tmp_path / "src" / "tricky.txt").write_text(
        "plain\nmid\x02line\nmid\x01line\n\x02starts-line\n\x01starts-line\n"
    )
    sh("add", ".")
    sh("commit", "-qm", "tricky \x02 subject \x01 bytes")
    commits, changes, _ = parse_history(git_log_raw(repo))
    assert len(commits) == 4
    assert all(len(c[0]) == 40 for c in commits)
    tricky = [c for c in commits if "tricky" in c[3]]
    assert len(tricky) == 1
    assert tricky[0][4] == 1 and tricky[0][8] == 5  # 1 file added, 5 lines


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


def test_line_changes_load_through_catalog_schema(spark, tmp_path):
    from clickhub_spark.catalog import LINE_CHANGES_SCHEMA

    repo = _mkrepo(tmp_path)
    tsvs = extract_git_history(repo, str(tmp_path / "tsv"))
    lc = read_positional_tsv(
        spark, tsvs["line_changes"], LINE_CHANGES_SCHEMA, literals={"repo_name": "acme/src"}
    )
    rows = lc.collect()
    assert len(rows) == 4  # 3 adds + 1 grow line
    assert {r.sign for r in rows} == {1}
    assert {r.line_type for r in rows} <= {"Empty", "Comment", "Punct", "Code"}
    assert all(r.time is not None for r in rows)


def test_backslash_content_round_trips_through_ingest(spark, tmp_path):
    """Round-12 review finding: extract writes ClickHouse-TSV
    backslash escaping and read_positional_tsv unescapes — a code
    line containing backslashes (regex, Windows path, or the literal
    string '\\N') must survive the extract -> TSV -> ingest loop
    byte-identically instead of being mangled or nulled."""
    import subprocess

    from clickhub_spark.catalog import LINE_CHANGES_SCHEMA

    repo = str(tmp_path / "bs")
    subprocess.run(["git", "init", "-q", repo], check=True)
    for k, v in (("user.email", "t@t"), ("user.name", "t")):
        subprocess.run(["git", "-C", repo, "config", k, v], check=True)
    hostile = 're.sub(r"\\\\d+", "", s)\npath = "C:\\\\tmp"\nmarker = "\\\\N"\n'
    with open(f"{repo}/f.py", "w") as fh:
        fh.write(hostile)
    subprocess.run(["git", "-C", repo, "add", "."], check=True)
    subprocess.run(
        ["git", "-C", repo, "commit", "-q", "-m", "bs"], check=True
    )
    tsvs = extract_git_history(repo, str(tmp_path / "tsv"))
    lc = read_positional_tsv(
        spark, tsvs["line_changes"], LINE_CHANGES_SCHEMA,
        literals={"repo_name": "a/b"},
    )
    got = {r.line for r in lc.collect()}
    assert got == {ln for ln in hostile.splitlines()}


def test_empty_repo_yields_empty_tsvs(tmp_path):
    repo = str(tmp_path / "empty")
    subprocess.run(["git", "init", "-q", repo], check=True)
    tsvs = extract_git_history(repo, str(tmp_path / "out"))
    assert open(tsvs["commits"]).read() == ""
    assert open(tsvs["file_changes"]).read() == ""
    assert open(tsvs["line_changes"]).read() == ""
