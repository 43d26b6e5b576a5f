"""Statement-path concurrency (VERDICT r12 item 7): the reference's
bootstrap runs while workers insert — one session INSERT SELECTs and
OPTIMIZEs while another reads FINAL.  Pins:

- metadata publish (_persist) is atomic: a reader re-loading
  _ddl.json mid-write NEVER sees partial JSON (os.replace contract);
- the OPTIMIZE data swap never shows a half-published state: a
  concurrent FINAL reader sees a complete snapshot — every key
  exactly once, every row internally consistent (v encodes its own
  ver) — with only bounded, retryable transient misses during the
  two-rename window (writer.compact's documented contract; the
  reader-side wait in Warehouse.read covers the listing race, the
  test retry covers the executor-scan race);
- readers never "recover" a swap themselves (that would race the
  writer's second rename) — recovery stays with the next mutation.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import SparkSession

from clickhub_spark.ddl import Warehouse

ROUNDS = 5
KEYS = 100


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("ddl-concurrency-tests")
        .getOrCreate()
    )
    yield s


def test_persist_atomic_under_reader(tmp_path):
    """_ddl.json is published with os.replace: a reader loading it at
    ANY instant parses complete JSON (never a torn write)."""
    wh = Warehouse(str(tmp_path))
    wh.execute("CREATE DATABASE ana")
    wh.execute(
        "CREATE TABLE ana.m (`k` Int64, `v` Int64) "
        "ENGINE = MergeTree ORDER BY (k)"
    )
    meta = tmp_path / "ana" / "m" / "_ddl.json"
    stop = threading.Event()
    errors: list[Exception] = []

    def writer():
        td = wh.table_def("ana.m")
        try:
            for _ in range(300):
                wh._persist(td)
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=writer)
    t.start()
    reads = 0
    while not stop.is_set() or reads == 0:
        d = json.loads(meta.read_text())
        assert d["name"] == "m" and len(d["columns"]) == 2
        reads += 1
    t.join()
    assert not errors and reads > 0


def test_optimize_final_vs_concurrent_reader(spark, tmp_path):
    """One Warehouse session INSERT SELECTs + OPTIMIZEs in a loop; a
    SECOND Warehouse over the same root (the two-process analog —
    all shared state is on disk) reads FINAL concurrently.  Every
    successful read is a complete, internally consistent snapshot."""
    root = str(tmp_path)
    wh_w = Warehouse(root)
    wh_w.execute("CREATE DATABASE ana")
    wh_w.execute(
        "CREATE TABLE ana.ct (`k` Int64, `v` Int64, `ver` Int64) "
        "ENGINE = ReplacingMergeTree(ver) ORDER BY (k)"
    )
    wh_w.execute(
        f"INSERT INTO ana.ct SELECT number AS k, number * 1000 AS v, "
        f"0 AS ver FROM numbers({KEYS})",
        spark=spark,
    )
    wh_r = Warehouse(root)  # second "process": fresh metadata load
    writer_err: list[BaseException] = []
    done = threading.Event()

    def writer():
        try:
            for r in range(1, ROUNDS + 1):
                wh_w.execute(
                    f"INSERT INTO ana.ct SELECT number AS k, "
                    f"number * 1000 + {r} AS v, {r} AS ver "
                    f"FROM numbers({KEYS})",
                    spark=spark,
                )
                wh_w.execute("OPTIMIZE TABLE ana.ct FINAL", spark=spark)
        except BaseException as e:  # pragma: no cover
            writer_err.append(e)
        finally:
            done.set()

    from clickhub_spark.operators import mutate as _mutate

    # probe once: with renameat2 RENAME_EXCHANGE available the table
    # path NEVER transiently disappears (VERDICT r13 item 4) — a
    # PATH_NOT_FOUND on the table dir is then a hard failure, not a
    # retryable transient.  Executor FILE-level races (a file of the
    # retired generation unlinked between listing and open) remain
    # retryable on any platform.
    probe_a, probe_b = tmp_path / "__xa", tmp_path / "__xb"
    probe_a.mkdir(), probe_b.mkdir()
    atomic_swap = _mutate.exchange_dirs(str(probe_a), str(probe_b))

    def read_final_with_retry() -> list:
        for _ in range(30):
            try:
                return wh_r.read_final(spark, "ana.ct").collect()
            except Exception as e:
                msg = str(e)
                if atomic_swap and "PATH_NOT_FOUND" in msg and "/data" in msg:
                    raise AssertionError(
                        "atomic-exchange swap exposed a missing table "
                        "dir — the renameat2 route must never do that"
                    ) from e
                if any(
                    s in msg
                    for s in (
                        "PATH_NOT_FOUND",
                        "FileNotFound",
                        "does not exist",
                        "REFRESH",
                        "FileReadException",
                    )
                ):
                    time.sleep(0.1)
                    continue
                raise
        raise AssertionError("reader starved out by the swap loop")

    t = threading.Thread(target=writer)
    t.start()
    snapshots = 0
    transient = 0
    while not done.is_set():
        rows = read_final_with_retry()
        ks = [r.k for r in rows]
        # complete: every key exactly once (FINAL collapse, no torn
        # part visible); consistent: v encodes the row's own ver
        assert sorted(ks) == list(range(KEYS)), "half-published snapshot"
        for r in rows:
            assert 0 <= r.ver <= ROUNDS
            assert r.v == r.k * 1000 + r.ver, "torn row"
        snapshots += 1
    t.join()
    assert not writer_err, writer_err
    # after the writer finishes, FINAL shows the last round everywhere
    rows = read_final_with_retry()
    assert sorted(r.k for r in rows) == list(range(KEYS))
    assert {r.ver for r in rows} == {ROUNDS}
    assert all(r.v == r.k * 1000 + ROUNDS for r in rows)
    assert snapshots > 0
