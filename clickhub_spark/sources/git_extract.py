"""Git-history TSV producer — closes the loop the reference leaves to
an external binary (SURVEY §2.A5): the reference shells out to
``clickhouse git-import`` inside a clone (reference
repo/importer.py:86-90) and then ingests the TSVs it drops; this
module produces ``commits.tsv``, ``file_changes.tsv`` AND
``line_changes.tsv`` in the exact positional layout of the
reference's ingest casts (reference types.json:6 c1..c13,
types.json:12 c1..c22, types.json:18 c1..c37) from any local git
repository using one ``git log --raw --numstat -p -U0`` pass: raw
status lines give change types, numstat gives per-file line counts,
and the zero-context patch gives hunks and individual line changes —
so hunk counts are REAL (classified added/removed/changed per the
hunk's content), and per-line rows carry line numbers, indent, a
line-type classification (Empty/Comment/Punct/Code) and prev-commit
lineage (the last commit that touched the same path, tracked
oldest→newest; renames carry lineage from the old path).

Like the reference's producer this is deliberately an OUT-OF-ENGINE,
driver-side step: one subprocess per repo clone, emitting bounded TSV
files that the distributed ingest (sources.tsv.read_positional_tsv →
incremental_append) then loads.  Parallelism across repos comes from
the work queue's many workers, not from Spark — a single repo's
history is small; 128k repos × one subprocess each is the reference's
own scaling model (config.yml: workers poll the queue).

Divergences from ``clickhouse git-import``, all documented:
- merge commits are listed in ``commits`` with zero diff stats
  (git log suppresses combined diffs by default); the reference
  binary diffs against the first parent.
- added lines carry line_number_old=0 and deleted lines
  line_number_new=0 (the reference binary's exact numbering of the
  opposite side is undocumented; ours is deterministic and stated).
- tabs/newlines inside commit messages, author names, paths, or line
  content are replaced by spaces so the TSV framing is unambiguous.
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
    ``--numstat`` line counts, then the ``-U0`` patch.  UTC timestamps
    to match the reference's DateTime('UTC') columns (types.json:6)."""
    out = subprocess.run(
        [
            "git",
            # quotePath=false: non-ASCII paths would otherwise be
            # C-quoted ("h\303\251llo.py") in --raw/--numstat but not in
            # patch headers, so the three sections key the same file by
            # different strings and hunk/line rows silently vanish
            "-c",
            "core.quotePath=false",
            "log",
            "-M",
            "-C",
            "--raw",
            "--numstat",
            "-p",
            "-U0",
            "--no-color",
            "--date=format-local:%Y-%m-%d %H:%M:%S",
            f"--pretty=format:{_HDR}%H{_SEP}%an{_SEP}%ad{_SEP}%s",
        ],
        cwd=repo_dir,
        env={**os.environ, "TZ": "UTC"},
        capture_output=True,
        text=True,
        errors="replace",  # repos may mix encodings in patch content
    )
    if out.returncode != 0:
        if "does not have any commits" in out.stderr:
            return ""
        raise RuntimeError(f"git log failed in {repo_dir}: {out.stderr.strip()}")
    return out.stdout


_HUNK_RE = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@ ?(.*)$")
_NUMSTAT_RE = re.compile(r"^(\d+|-)\t(\d+|-)\t(.+)$")
_HASH_RE = re.compile(r"[0-9a-f]{40}")

#: prev_time when no earlier commit touched the path (DateTime zero).
_EPOCH = "1970-01-01 00:00:00"


def _line_type(content: str) -> str:
    """Enum8('Empty'=0,'Comment'=1,'Punct'=2,'Code'=3) classification
    (types.json:18 c12) — the same cheap lexical heuristic class the
    reference's binary applies."""
    t = content.strip()
    if not t:
        return "Empty"
    if t.startswith(("//", "#", "/*", "*", "--", ";", "'")):
        return "Comment"
    if all(not c.isalnum() for c in t):
        return "Punct"
    return "Code"


def _indent(content: str) -> int:
    return len(content) - len(content.lstrip(" \t"))


class _Hunk:
    __slots__ = ("num", "old_start", "new_start", "context", "lines")

    def __init__(self, num: int, old_start: int, new_start: int, context: str):
        self.num = num
        self.old_start = old_start
        self.new_start = new_start
        self.context = context
        self.lines: list[tuple[int, int, int, str]] = []  # sign, old_ln, new_ln, text

    @property
    def added(self) -> int:
        return sum(1 for s, *_ in self.lines if s == 1)

    @property
    def deleted(self) -> int:
        return sum(1 for s, *_ in self.lines if s == -1)

    def kind(self) -> str:
        if self.added and self.deleted:
            return "changed"
        return "added" if self.added else "removed"


def _parse_patch(lines: list[str]) -> dict[str, list[_Hunk]]:
    """Parse the -U0 patch section into {new_path: [hunks]}."""
    by_file: dict[str, list[_Hunk]] = {}
    cur: list[_Hunk] | None = None
    hunk: _Hunk | None = None
    old_ln = new_ln = 0
    path_old = path_new = ""
    for ln in lines:
        if ln.startswith("diff --git "):
            cur, hunk = None, None
            path_old = path_new = ""
            continue
        if cur is None:
            if ln.startswith("--- "):
                path_old = ln[4:].removeprefix("a/")
            elif ln.startswith("+++ "):
                path_new = ln[4:].removeprefix("b/")
                path = path_new if path_new != "/dev/null" else path_old
                cur = by_file.setdefault(path, [])
            continue
        m = _HUNK_RE.match(ln)
        if m:
            old_ln, new_ln = int(m.group(1)), int(m.group(3))
            hunk = _Hunk(len(cur) + 1, old_ln, new_ln, _clean(m.group(5)))
            cur.append(hunk)
            continue
        if hunk is None or ln.startswith("\\"):  # '\ No newline at end of file'
            continue
        if ln.startswith("+"):
            hunk.lines.append((1, 0, new_ln, ln[1:]))
            new_ln += 1
        elif ln.startswith("-"):
            hunk.lines.append((-1, old_ln, 0, ln[1:]))
            old_ln += 1
    return by_file


def parse_history(log_text: str) -> tuple[list[list], list[list], list[list]]:
    """Parse the combined log into (commits_rows, file_changes_rows,
    line_changes_rows) matching the types.json:6/12/18 positional
    layouts.  Commits are processed oldest→newest so per-path
    prev-commit lineage (line_changes c13..c15) is a single forward
    scan."""
    commits: list[list] = []
    changes: list[list] = []
    line_rows: list[list] = []
    last_touch: dict[str, tuple[str, str, str]] = {}  # path -> (hash, author, time)

    # Split on newline+\x02, not bare \x02: the pretty-format header
    # always STARTS a line, while patch/subject content can legally
    # contain a raw \x02 byte mid-line — a bare split would mis-frame
    # that commit and silently shift its rows.
    text = log_text[1:] if log_text.startswith(_HDR) else log_text
    blocks = [b for b in text.split("\n" + _HDR) if b.strip()]
    for block in reversed(blocks):  # git log prints newest first
        lines = block.splitlines()
        # maxsplit=3: a raw \x01 inside the SUBJECT (legal in git
        # messages) must stay part of the message — an unbounded split
        # would truncate it (or shift fields for a \x01 in the author)
        chash, author, when, message = (
            lines[0].split(_SEP, 3) + ["", "", ""]
        )[:4]
        if not _HASH_RE.fullmatch(chash):
            # a mid-line \x01 in content can still corrupt ONE header;
            # drop that block rather than emit rows under a bogus hash
            continue
        author, message = _clean(author), _clean(message)

        # split the block: raw/numstat prelude vs patch
        patch_start = next(
            (i for i, ln in enumerate(lines) if ln.startswith("diff --git ")),
            len(lines),
        )
        prelude, patch = lines[1:patch_start], lines[patch_start:]

        # --raw status lines (:mode mode sha sha S\tpath[\tnew])
        files: dict[str, list] = {}  # new_path -> [change_type, old_path]
        for ln in prelude:
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
        # --numstat lines (added\tdeleted\tpath)
        counts: dict[str, tuple[int, int]] = {}
        for ln in prelude:
            m = _NUMSTAT_RE.match(ln)
            if not m:
                continue
            a, d = (int(x) if x.isdigit() else 0 for x in (m.group(1), m.group(2)))
            counts[_resolve_numstat_path(m.group(3))] = (a, d)

        hunks_by_file = _parse_patch(patch)

        n_by = {"Add": 0, "Delete": 0, "Rename": 0, "Modify": 0}
        lines_added = lines_deleted = 0
        c_hk = {"added": 0, "removed": 0, "changed": 0}
        file_rows: list[tuple[list, str, str]] = []  # (row, path, old_path)
        for path, (label, old) in files.items():
            a, d = counts.get(path, (0, 0))
            lines_added += a
            lines_deleted += d
            if label in n_by:
                n_by[label] += 1
            f_hk = {"added": 0, "removed": 0, "changed": 0}
            for h in hunks_by_file.get(path, []):
                f_hk[h.kind()] += 1
                c_hk[h.kind()] += 1
            row = [
                label,
                _clean(path),
                _clean(old),
                _ext(path),
                a,
                d,
                f_hk["added"],
                f_hk["removed"],
                f_hk["changed"],
            ]
            file_rows.append((row, path, old))

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
            c_hk["added"],
            c_hk["removed"],
            c_hk["changed"],
        ]
        commits.append(commit)
        for row, path, old in file_rows:
            # c10..c22: commit hash/author/time/message + commit stats
            changes.append(row + [chash, author, when, message] + commit[4:])
            # line_changes: one row per +/- line of every hunk
            prev = last_touch.get(path) or (last_touch.get(old) if old else None)
            p_hash, p_author, p_time = prev or ("", "", _EPOCH)
            for h in hunks_by_file.get(path, []):
                for sign, o_ln, n_ln, content in h.lines:
                    line_rows.append(
                        [
                            sign,
                            o_ln,
                            n_ln,
                            h.num,
                            h.old_start,
                            h.new_start,
                            h.added,
                            h.deleted,
                            h.context,
                            _clean(content),
                            _indent(content),
                            _line_type(content),
                            p_hash,
                            p_author,
                            p_time,
                        ]
                        + row  # c16..c24: file change cols
                        + [chash, author, when, message]  # c25..c28
                        + commit[4:]  # c29..c37: commit stats
                    )
        for _, path, _old in file_rows:  # update lineage AFTER emitting
            last_touch[path] = (chash, author, when)

    commits.reverse()  # newest-first like git log, matching prior layout
    return commits, changes, line_rows


def extract_git_history(repo_dir: str, out_dir: str) -> dict[str, str]:
    """Produce ``commits.tsv`` + ``file_changes.tsv`` +
    ``line_changes.tsv`` for a local clone, in the layout the
    reference ingests (types.json:6,12,18).  Returns
    {table_name: tsv_path}."""
    os.makedirs(out_dir, exist_ok=True)
    commits, changes, line_rows = parse_history(git_log_raw(repo_dir))
    paths = {}
    for name, rows in (
        ("commits", commits),
        ("file_changes", changes),
        ("line_changes", line_rows),
    ):
        p = os.path.join(out_dir, f"{name}.tsv")
        with open(p, "w") as f:
            for row in rows:
                # ClickHouse-TSV backslash escaping, matching the
                # engine_tsv sink: without it, code-content cells
                # containing backslashes would be mangled by the
                # reader's unescape (and a literal '\\N' cell would
                # read back as NULL)
                f.write(
                    "\t".join(
                        str(v).replace("\\", "\\\\")
                        if isinstance(v, str)
                        else str(v)
                        for v in row
                    )
                    + "\n"
                )
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
