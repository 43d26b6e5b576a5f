"""Custom Spark data sources via the Python DataSource API (Spark 4).

The reference treats "sources" as external binaries piped into the
server: ``clickhouse git-import`` emits TSVs that the app then ingests
(reference repo/importer.py:86-108), and ``system.numbers`` /
``numbers(N)`` is the zero-input generator table every ClickHouse user
leans on for backfills and tests.  Here both become FIRST-CLASS Spark
sources — ``spark.read.format("engine_numbers")`` and
``spark.read.format("gitlog")`` — using ``pyspark.sql.datasource``:
planning happens once on the driver (``partitions()``), then each
partition is read by an independent task, so the sources scale out
like any parquet scan instead of funneling through one generator
process.

Scale shape:
- ``engine_numbers``: each task materializes ONE contiguous range as
  Arrow record batches — no data movement, no driver involvement after
  planning, N tasks for N partitions.  The pushdown variant prunes
  whole partitions at planning time from Catalyst-pushed comparison
  filters, the same contract a parquet scan honors with min/max stats.
- ``gitlog``: planning shells out once for the commit count; each task
  reads its own ``git log --skip/--max-count`` slice.  On a real
  cluster the repo clone must live on shared/replicated storage — the
  same constraint the reference's per-worker clone model has
  (reference repo/importer.py:47-60).
- ``engine_numbers_stream``: a replayable micro-batch stream with
  explicit offsets ({"pos": N}); ``readBetweenOffsets`` makes recovery
  deterministic, so exactly-once sinks re-reading a committed range
  get identical rows.

Executor note: like every class-by-reference Python boundary in this
package, multi-process masters need ``session.ship_package`` (or
--py-files) so workers can import this module.
"""

from __future__ import annotations

import os
import subprocess
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _range_partitions(start: int, end: int, num_partitions: int) -> list[_RangePartition]:
    total = max(0, end - start)
    if total == 0:
        # one empty partition, not zero: with no partitions Spark
        # falls back to a single read(None) call.
        return [_RangePartition(start, start)]
    n = max(1, min(num_partitions, total))
    step = -(-total // n)  # ceil div
    return [
        _RangePartition(s, min(s + step, end)) for s in range(start, end, step)
    ]


class NumbersReader(DataSourceReader):
    """Batch reader: one Arrow batch per partition slice."""

    def __init__(self, options):
        self.start = int(options.get("start", 0))
        self.end = self.start + int(options.get("n", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        return _range_partitions(self.start, self.end, self.num_partitions)

    def read(self, partition: _RangePartition):
        import pyarrow as pa

        yield pa.record_batch(
            {"num": pa.array(range(partition.start, partition.end), pa.int64())}
        )


class NumbersPushdownReader(NumbersReader):
    """Adds planning-time partition pruning from pushed comparison
    filters on ``num`` — consumed filters are NOT re-evaluated by
    Spark (they are dropped from the returned iterable), so the scan
    itself is the filter, like a parquet row-group skip.

    Requires ``spark.sql.python.filterPushdown.enabled=true`` (Spark
    fails fast otherwise); the engine session sets it, but the plain
    ``engine_numbers`` source stays pushdown-free so it also runs on a
    vanilla session.
    """

    def pushFilters(self, filters):
        for f in filters:
            # isinstance FIRST: only the comparison filters carry
            # columnPath (e.g. IsNotNull does not).
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and f.attribute == ("num",):
                v = int(f.value)
                if isinstance(f, EqualTo):
                    self.start = max(self.start, v)
                    self.end = min(self.end, v + 1)
                elif isinstance(f, GreaterThan):
                    self.start = max(self.start, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.start = max(self.start, v)
                elif isinstance(f, LessThan):
                    self.end = min(self.end, v)
                else:  # LessThanOrEqual
                    self.end = min(self.end, v + 1)
            else:
                yield f


class NumbersDataSource(DataSource):
    """``system.numbers`` / ``numbers(N)`` analog as a Python source."""

    @classmethod
    def name(cls) -> str:
        return "engine_numbers"

    def schema(self) -> str:
        return "num BIGINT"

    def reader(self, schema) -> DataSourceReader:
        return NumbersReader(self.options)


class NumbersPushdownDataSource(NumbersDataSource):
    @classmethod
    def name(cls) -> str:
        return "engine_numbers_pushdown"

    def reader(self, schema) -> DataSourceReader:
        return NumbersPushdownReader(self.options)


_GIT_FIELD_SEP = "\x01"
#: record separator is NUL — the ONE byte git refuses in any object
#: (messages are C strings), so record framing can never be corrupted
#: by hostile commit subjects; the subject is the LAST field and split
#: with maxsplit, so \x01 inside a subject survives too.
_GIT_REC_SEP = "\x00"
# author-date %at is stable across clones; committer fields are not
# (rebases/am rewrite them) but we read them anyway — the fixture repos
# fix both via GIT_AUTHOR_DATE/GIT_COMMITTER_DATE.
#: machine-formatted fields (%H, %at, %P — no \x01 can ever appear in
#: them) come FIRST so a raw \x01 inside a free-text field (author
#: name or subject, both legal in git) can only blur the an/ae/s
#: boundaries, never shift the hash/time/parents parse (int(%at)
#: would raise on a shifted field otherwise)
_GIT_FORMAT = "%x00" + _GIT_FIELD_SEP.join(
    ["%H", "%at", "%P", "%an", "%ae", "%s"]
)


class GitLogPartition(InputPartition):
    def __init__(self, repo: str, skip: int, count: int):
        self.repo = repo
        self.skip = skip
        self.count = count


class GitLogReader(DataSourceReader):
    """Commit-history reader: driver plans index ranges over
    ``rev-list --count``; each task reads its slice with
    ``git log --skip/--max-count`` (git's ordering is deterministic
    for a fixed HEAD, so slices tile the history exactly).
    The full-fidelity TSV path (file/line changes, hunks) stays in
    sources/git_extract.py; this source is the commits facet as a
    live, pushdown-free table."""

    def __init__(self, options):
        self.repo = options.get("path")
        if not self.repo:
            raise ValueError("gitlog source requires .option('path', <repo dir>)")
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        out = subprocess.run(
            ["git", "-C", self.repo, "rev-list", "--count", "HEAD"],
            capture_output=True,
            text=True,
            check=False,
        )
        if out.returncode != 0:
            # a just-initialized repo has no HEAD — an empty table,
            # not a planning crash (git_extract.git_log_raw's contract)
            if "does not have any commits" in out.stderr or (
                "unknown revision" in out.stderr
            ):
                return [GitLogPartition(self.repo, 0, 0)]
            raise RuntimeError(
                f"git rev-list failed in {self.repo!r}: {out.stderr[:200]}"
            )
        total = int(out.stdout.strip())
        return [
            GitLogPartition(self.repo, p.start, p.end - p.start)
            for p in _range_partitions(0, total, self.num_partitions)
        ]

    def read(self, partition: GitLogPartition):
        if partition.count == 0:  # empty-repo sentinel partition
            return
        out = subprocess.run(
            [
                "git",
                "-C",
                partition.repo,
                "log",
                f"--skip={partition.skip}",
                f"--max-count={partition.count}",
                f"--pretty=format:{_GIT_FORMAT}",
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        # record separator, not newline-split: commit subjects can
        # contain no newlines under %s, but being explicit costs
        # nothing and survives future %b use.  The format string BEGINS
        # with the separator, so the first split element is empty —
        # filter before enumerate or commit_idx is off by one.
        recs = [r.strip("\n") for r in out.stdout.split(_GIT_REC_SEP)]
        recs = [r for r in recs if r]
        for idx, rec in enumerate(recs):
            h, at, parents, an, ae, subject = rec.split(_GIT_FIELD_SEP, 5)
            yield (
                partition.skip + idx,
                h,
                an,
                ae,
                int(at),
                len(parents.split()) if parents else 0,
                subject,
            )


class GitLogDataSource(DataSource):
    """The reference's git-import, re-expressed as a Spark source
    (reference repo/importer.py:86-90 shells out and ingests files;
    here the history IS a table)."""

    @classmethod
    def name(cls) -> str:
        return "gitlog"

    def schema(self) -> str:
        return (
            "commit_idx BIGINT, hash STRING, author STRING, "
            "author_email STRING, authored_at BIGINT, n_parents INT, "
            "subject STRING"
        )

    def reader(self, schema) -> DataSourceReader:
        return GitLogReader(self.options)


class NumbersStreamReader(SimpleDataSourceStreamReader):
    """Replayable offset-tracked micro-batch source.  Offsets are
    ``{"pos": N}``; a batch is the half-open range [start, start+rows)
    capped at ``maxRows`` — after the cap the stream idles (empty
    batches), which lets tests drain it deterministically with
    availableNow-style loops."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.max_rows = int(options.get("maxrows", 1000))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        s = start["pos"]
        # never behind the start offset: if maxRows was lowered below
        # an already-committed position, stay put (emitting nothing)
        # instead of rewinding and re-emitting committed rows
        e = max(s, min(s + self.rows_per_batch, self.max_rows))
        return (iter([(i,) for i in range(s, e)]), {"pos": e})

    def readBetweenOffsets(self, start, end):
        return iter([(i,) for i in range(start["pos"], end["pos"])])


class NumbersStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "engine_numbers_stream"

    def schema(self) -> str:
        return "num BIGINT"

    def simpleStreamReader(self, schema):
        return NumbersStreamReader(self.options)


class _TsvCommit(WriterCommitMessage):
    """Picklable WriterCommitMessage: the staged file + its row count."""

    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


_TSV_CTRL = {"\t": " ", "\n": " ", "\r": " "}


class TsvSinkWriter(DataSourceWriter):
    """Exactly-once headerless positional TSV sink (the reference's
    interchange format — sources/tsv.read_positional_tsv reads the
    output back).  Tasks write to a per-JOB staging dir (the job id is
    minted once on the driver and pickled into every task); commit()
    atomically renames only the files named in the surviving commit
    messages, so a retried task's losing attempt dies with the staging
    dir and a failed job leaves the target EMPTY of partial output.
    Control characters in strings are replaced by spaces — the same
    framing rule sources/git_extract applies (TSV is positional; an
    embedded tab would shift every later column).

    Executors stage parts under ``<path>/.staging-<job>`` on their
    LOCAL filesystem and the driver's commit() renames them into
    place, so the exactly-once contract requires ``path`` to be on a
    filesystem shared by driver and executors (same single-node
    deploy contract as the gitlog source, pyds.py module docstring).
    On a multi-node master without shared storage the commit's
    existence check fails fast with the staged path in the error
    (ADVICE r5) rather than silently losing parts."""

    def __init__(self, options, schema, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("engine_tsv sink requires .option('path', <dir>)")
        self.field_names = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex

    def _staging(self) -> str:
        return os.path.join(self.path, f".staging-{self.job_id}")

    def write(self, rows) -> _TsvCommit:
        import uuid

        stage = self._staging()
        os.makedirs(stage, exist_ok=True)
        fname = os.path.join(stage, f"part-{uuid.uuid4().hex}.tsv")
        n = 0
        with open(fname, "w") as f:
            for row in rows:
                cells = []
                for name in self.field_names:
                    v = row[name]
                    if v is None:
                        s = "\\N"
                    else:
                        # escape backslashes FIRST (the ClickHouse TSV
                        # rule): without it a genuine string value of
                        # exactly "\\N" round-trips as NULL through the
                        # readers' null-marker match
                        s = str(v).replace("\\", "\\\\")
                        for bad, repl in _TSV_CTRL.items():
                            if bad in s:
                                s = s.replace(bad, repl)
                    cells.append(s)
                f.write("\t".join(cells) + "\n")
                n += 1
        return _TsvCommit(fname, n)

    def commit(self, messages) -> None:
        import shutil

        # validate EVERY staged part before deleting or renaming
        # ANYTHING: a part staged on an executor without shared
        # storage must fail the whole commit up front — before the
        # overwrite clears old data, before any part lands
        missing = [
            m.staged_path
            for m in messages
            if m is not None and not os.path.exists(m.staged_path)
        ]
        if missing:
            raise FileNotFoundError(
                f"engine_tsv commit: staged parts {missing!r} are not "
                f"visible from the driver — the sink requires driver and "
                f"executors to share one filesystem (see TsvSinkWriter "
                f"docstring); target {self.path!r} was left untouched"
            )
        if self.overwrite:
            for existing in os.listdir(self.path):
                if existing.endswith(".tsv"):
                    os.unlink(os.path.join(self.path, existing))
        total = 0
        for i, msg in enumerate(messages):
            if msg is None:
                continue
            # job id in the final name: a second APPEND job must not
            # rename over a previous job's part-00000.tsv
            os.rename(
                msg.staged_path,
                os.path.join(self.path, f"part-{self.job_id[:8]}-{i:05d}.tsv"),
            )
            total += msg.n_rows
        shutil.rmtree(self._staging(), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)


class TsvSinkDataSource(DataSource):
    """``df.write.format("engine_tsv").option("path", d).save()``."""

    @classmethod
    def name(cls) -> str:
        return "engine_tsv"

    def writer(self, schema, overwrite: bool):
        return TsvSinkWriter(self.options, schema, overwrite)


_ALL = (
    NumbersDataSource,
    NumbersPushdownDataSource,
    GitLogDataSource,
    NumbersStreamDataSource,
    TsvSinkDataSource,
)


def register_sources(spark: SparkSession, only=None) -> None:
    """Register engine sources on the session (idempotent —
    re-registering a name replaces the class).  ``only`` takes an
    iterable of DataSource classes to restrict registration: each
    ``spark.dataSource.register`` cloudpickles the class to the JVM,
    and cold-session cost scales with the number of classes (measured
    ~24 s all-five vs ~5.6 s one on a loaded box, ~4 s vs <1 s quiet
    — guide §5, driver-side build cost), so query builders that need
    one source should not pay for five."""
    for cls in (_ALL if only is None else only):
        spark.dataSource.register(cls)
