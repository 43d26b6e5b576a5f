"""Git-history TSV producer — closes the loop the reference leaves to
an external binary (SURVEY §2.A5): the reference shells out to
``clickhouse git-import`` inside a clone (reference
repo/importer.py:86-90) and then ingests the TSVs it drops; this
module produces ``commits.tsv`` and ``file_changes.tsv`` in the exact
positional layout of the reference's ingest casts (reference
types.json:6 c1..c13, types.json:12 c1..c22) from any local git
repository using one ``git log --raw --numstat`` pass.

Like the reference's producer this is deliberately an OUT-OF-ENGINE,
driver-side step: one subprocess per repo clone, emitting bounded TSV
files that the distributed ingest (sources.tsv.read_positional_tsv →
incremental_append) then loads.  Parallelism across repos comes from
the work queue's many workers, not from Spark — a single repo's
history is small; 128k repos × one subprocess each is the reference's
own scaling model (config.yml: workers poll the queue).

Divergences from ``clickhouse git-import``, all documented:
- hunk counts (hunks_added/removed/changed and the per-file
  equivalents) are 0 — computing them needs full patch parsing
  (``line_changes``, which SURVEY scopes out as the reference's
  external-binary territory).
- merge commits are listed in ``commits`` with zero diff stats
  (git log suppresses combined diffs by default); the reference
  binary diffs against the first parent.
- tabs/newlines inside commit messages, author names, or paths are
  replaced by spaces so the TSV framing is unambiguous.
"""

from __future__ import annotations

import os
import re
import subprocess

#: raw-diff status letter → the reference's Enum8 label
#: (types.json:12 'Add'=1,'Delete'=2,'Modify'=3,'Rename'=4,'Copy'=5,'Type'=6).
_STATUS = {"A": "Add", "D": "Delete", "M": "Modify", "R": "Rename", "C": "Copy", "T": "Type"}

_CTRL = re.compile(r"[\t\n\r\x00-\x08\x0b-\x1f]")

_HDR = "\x02"
_SEP = "\x01"


def _clean(s: str) -> str:
    return _CTRL.sub(" ", s)


def _resolve_numstat_path(path: str) -> str:
    """Numstat spells renames ``old => new`` or ``pre{old => new}post``;
    resolve to the post-rename path."""
    m = re.search(r"\{(.*) => (.*)\}", path)
    if m:
        resolved = path[: m.start()] + m.group(2) + path[m.end() :]
        return resolved.replace("//", "/")
    if " => " in path:
        return path.split(" => ", 1)[1]
    return path


def _ext(path: str) -> str:
    base = path.rsplit("/", 1)[-1]
    if "." in base[1:]:
        return base.rsplit(".", 1)[1]
    return ""


def git_log_raw(repo_dir: str) -> str:
    """One-pass history dump: per commit a \\x02-framed header
    (hash/author/date/subject), then ``--raw`` status lines, then
    ``--numstat`` line counts.  UTC timestamps to match the
    reference's DateTime('UTC') columns (types.json:6)."""
    out = subprocess.run(
        [
            "git",
            "log",
            "-M",
            "-C",
            "--raw",
            "--numstat",
            "--date=format-local:%Y-%m-%d %H:%M:%S",
            f"--pretty=format:{_HDR}%H{_SEP}%an{_SEP}%ad{_SEP}%s",
        ],
        cwd=repo_dir,
        env={**os.environ, "TZ": "UTC"},
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        if "does not have any commits" in out.stderr:
            return ""
        raise RuntimeError(f"git log failed in {repo_dir}: {out.stderr.strip()}")
    return out.stdout


def parse_history(log_text: str) -> tuple[list[list], list[list]]:
    """Parse the combined log into (commits_rows, file_changes_rows)
    matching types.json:6 / types.json:12 positional layouts."""
    commits: list[list] = []
    changes: list[list] = []
    for block in log_text.split(_HDR):
        if not block.strip():
            continue
        lines = block.splitlines()
        chash, author, when, message = (lines[0].split(_SEP) + ["", "", ""])[:4]
        author, message = _clean(author), _clean(message)
        # pass 1: --raw status lines (:mode mode sha sha S\tpath[\tnew])
        files: dict[str, list] = {}  # new_path -> [change_type, old_path]
        for ln in lines[1:]:
            if not ln.startswith(":"):
                continue
            parts = ln.split("\t")
            status = parts[0].split(" ")[-1]  # e.g. M, A, R073
            label = _STATUS.get(status[0])
            if label is None:
                continue
            if status[0] in ("R", "C") and len(parts) >= 3:
                files[parts[2]] = [label, parts[1]]
            else:
                files[parts[1]] = [label, ""]
        # pass 2: --numstat lines (added\tdeleted\tpath)
        counts: dict[str, tuple[int, int]] = {}
        for ln in lines[1:]:
            if ln.startswith(":") or "\t" not in ln:
                continue
            a, d, path = (ln.split("\t", 2) + [""])[:3]
            added = int(a) if a.isdigit() else 0  # '-' = binary
            deleted = int(d) if d.isdigit() else 0
            counts[_resolve_numstat_path(path)] = (added, deleted)

        n_by = {"Add": 0, "Delete": 0, "Rename": 0, "Modify": 0}
        lines_added = lines_deleted = 0
        rows = []
        for path, (label, old) in files.items():
            a, d = counts.get(path, (0, 0))
            lines_added += a
            lines_deleted += d
            if label in n_by:
                n_by[label] += 1
            rows.append([label, _clean(path), _clean(old), _ext(path), a, d, 0, 0, 0])
        commit = [
            chash,
            author,
            when,
            message,
            n_by["Add"],
            n_by["Delete"],
            n_by["Rename"],
            n_by["Modify"],
            lines_added,
            lines_deleted,
            0,
            0,
            0,
        ]
        commits.append(commit)
        for r in rows:
            # c10..c22: commit hash/author/time/message + commit stats
            changes.append(r + [chash, author, when, message] + commit[4:])
    return commits, changes


def extract_git_history(repo_dir: str, out_dir: str) -> dict[str, str]:
    """Produce ``commits.tsv`` + ``file_changes.tsv`` for a local
    clone, in the layout the reference ingests (types.json:6,12).
    Returns {table_name: tsv_path}."""
    os.makedirs(out_dir, exist_ok=True)
    commits, changes = parse_history(git_log_raw(repo_dir))
    paths = {}
    for name, rows in (("commits", commits), ("file_changes", changes)):
        p = os.path.join(out_dir, f"{name}.tsv")
        with open(p, "w") as f:
            for row in rows:
                f.write("\t".join(str(v) for v in row) + "\n")
        paths[name] = p
    return paths


def clone(repo_url: str, dest: str) -> str:
    """Clone a repo for extraction (≙ reference repo/importer.py's
    clone step before git-import).  Works for local paths too, which
    is what the offline tests use."""
    subprocess.run(
        ["git", "clone", "--quiet", repo_url, dest],
        check=True,
        capture_output=True,
        text=True,
    )
    return dest
