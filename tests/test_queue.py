"""Queue claim semantics (SURVEY §2.I5-I7) — mirrors the reference's
KeeperMap contract: duplicate-insert rejection (repo/schedule.py:60-63),
priority claim order (repo/importer.py:138-139), CAS + verify-read
(repo/importer.py:146-155), release-even-on-failure (repo/importer.py:175)."""

import threading

import pytest

from clickhub_spark.queue import (
    AlreadyScheduled,
    QueueFull,
    SqliteWorkQueue,
    WorkQueue,
)


@pytest.fixture(params=["fs", "sqlite", "http"])
def make_queue(request, tmp_path):
    """Every test runs against ALL THREE backends — filesystem-CAS,
    sqlite-WAL, and the HTTP coordinator (queue_http.py) share one
    claim-protocol contract."""
    servers = []

    def make(max_queue_length=10_000):
        if request.param == "fs":
            return WorkQueue(str(tmp_path / "q"), max_queue_length)
        if request.param == "sqlite":
            return SqliteWorkQueue(str(tmp_path / "q.db"), max_queue_length)
        from clickhub_spark.queue_http import HttpWorkQueue, make_coordinator

        srv, _ = make_coordinator(max_queue_length, host="127.0.0.1")
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return HttpWorkQueue(f"http://127.0.0.1:{srv.server_address[1]}")

    yield make
    for srv in servers:
        srv.shutdown()
        srv.server_close()


def test_duplicate_insert_rejected(make_queue):
    q = make_queue()
    q.schedule("apache/spark")
    with pytest.raises(AlreadyScheduled):
        q.schedule("apache/spark")


def test_reschedule_while_claimed_rejected(make_queue):
    """An in-flight job (claimed, not yet released) must still block
    scheduling — the reference's KeeperMap row persists until the
    post-import DELETE (repo/importer.py:175), so two workers can
    never import the same repo concurrently."""
    q = make_queue()
    q.schedule("apache/spark")
    assert q.claim("w1").repo_name == "apache/spark"
    with pytest.raises(AlreadyScheduled):
        q.schedule("apache/spark")
    q.release("apache/spark", "w1")
    q.schedule("apache/spark")  # released → schedulable again


def test_queue_full(make_queue):
    q = make_queue(max_queue_length=2)
    q.schedule("a/a")
    q.schedule("b/b")
    with pytest.raises(QueueFull):
        q.schedule("c/c")


def test_claim_order_priority_desc_then_fifo(make_queue):
    q = make_queue()
    q.schedule("low/1", priority=1)
    q.schedule("high/1", priority=9)
    q.schedule("low/2", priority=1)
    job = q.claim("w1")
    assert job.repo_name == "high/1"
    assert job.worker_id == "w1"


def test_concurrent_claim_exactly_one_winner(make_queue):
    """Two racing claimants, one job — exactly one wins (the CAS heart
    of the system, repo/importer.py:145-155)."""
    q = make_queue()
    q.schedule("contested/repo")
    results = {}
    barrier = threading.Barrier(2)

    def worker(wid):
        barrier.wait()
        results[wid] = q.claim(wid)

    ts = [threading.Thread(target=worker, args=(w,)) for w in ("w1", "w2")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    winners = [w for w, job in results.items() if job is not None]
    assert len(winners) == 1
    assert results[winners[0]].repo_name == "contested/repo"


def test_release_even_on_failure_drops_job_and_worker_survives(make_queue):
    """Worker loop mirrors repo/importer.py:161-179: a failing import
    is logged and released (dropped, not retried); the loop continues
    to the next job."""
    q = make_queue()
    q.schedule("will/fail", priority=9)
    q.schedule("will/work", priority=1)

    def handler(job):
        if job.repo_name == "will/fail":
            raise RuntimeError("import blew up")

    done = q.work("w1", handler, max_polls=2)
    assert done == ["will/work"]
    assert q.failures == [("will/fail", "RuntimeError('import blew up')")]
    assert not q.is_scheduled("will/fail")  # dropped, not retried
    assert q.list_jobs() == []


def test_work_loop_processes_and_releases(make_queue):
    q = make_queue()
    q.schedule("a/a", priority=2)
    q.schedule("b/b", priority=1)
    seen = []
    done = q.work("w1", lambda job: seen.append(job.repo_name), max_polls=3)
    assert done == ["a/a", "b/b"]
    assert q.list_jobs() == []


def test_many_workers_many_jobs_each_processed_once(make_queue):
    """8 racing workers, 20 jobs: every job processed exactly once
    across the fleet (the linear-scale-out claim, reference
    README.md:8, start_workers.sh)."""
    q = make_queue()
    for i in range(20):
        q.schedule(f"org/repo{i:02d}", priority=i % 3)
    processed = []
    lock = threading.Lock()

    def worker(wid):
        done = q.work(wid, lambda job: None, max_polls=10)
        with lock:
            processed.extend(done)

    ts = [threading.Thread(target=worker, args=(f"w{i}",)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(processed) == sorted(f"org/repo{i:02d}" for i in range(20))
    assert len(processed) == len(set(processed))  # no double-processing
    assert q.list_jobs() == []


# ---------------------------------------------------------------------------
# HTTP-coordinator specifics: cross-host linearizability, lease recovery,
# fencing, snapshot restart (VERDICT r7 item 2)
# ---------------------------------------------------------------------------


@pytest.fixture
def http_coord(tmp_path):
    """A running coordinator + its URL; snapshot under tmp_path."""
    from clickhub_spark.queue_http import make_coordinator

    srv, coord = make_coordinator(
        snapshot_path=str(tmp_path / "queue.snap"), host="127.0.0.1"
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", coord
    srv.shutdown()
    srv.server_close()


def test_http_two_processes_no_shared_local_state(http_coord, tmp_path):
    """The multi-node claim (reference README.md:216-226, KeeperMap):
    two separate OS processes, each given ONLY the coordinator URL —
    no shared filesystem path, no shared sqlite file — drain 12 jobs
    with every job processed exactly once across the pair."""
    import subprocess
    import sys

    url, _ = http_coord
    from clickhub_spark.queue_http import HttpWorkQueue

    q = HttpWorkQueue(url)
    for i in range(12):
        q.schedule(f"org/repo{i:02d}", priority=i % 3)

    worker_src = (
        "import sys, json\n"
        "from clickhub_spark.queue_http import HttpWorkQueue\n"
        "q = HttpWorkQueue(sys.argv[1])\n"
        "done = q.work(sys.argv[2], lambda job: None, max_polls=12)\n"
        "print(json.dumps(done))\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker_src, url, f"proc-w{i}"],
            stdout=subprocess.PIPE,
            text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    import json as _json

    processed = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        processed.extend(_json.loads(out.strip().splitlines()[-1]))
    assert sorted(processed) == sorted(f"org/repo{i:02d}" for i in range(12))
    assert len(processed) == len(set(processed))  # exactly once, fleet-wide
    assert q.list_jobs() == []


def test_http_dead_worker_lease_recovery_and_fencing(http_coord):
    """Dead-worker recovery — the documented divergence from the
    reference (repo/importer.py:174-175 drops a dead worker's job
    forever): here the claim's lease expires, another worker reclaims
    the job, and the dead worker's late release is fenced off by its
    stale token."""
    import time as _time

    from clickhub_spark.queue_http import HttpWorkQueue

    url, _ = http_coord
    qa = HttpWorkQueue(url, lease_s=0.2)  # worker A: short lease
    qb = HttpWorkQueue(url, lease_s=300.0)  # worker B: normal lease

    qa.schedule("acme/orphaned")
    job_a = qa.claim("worker-a")
    assert job_a.repo_name == "acme/orphaned"
    # worker A "dies" here: no release.  Before expiry nobody else
    # can claim it (in-flight jobs stay exclusive)...
    assert qb.claim("worker-b") is None
    _time.sleep(0.3)
    # ...after expiry the job is claimable again
    job_b = qb.claim("worker-b")
    assert job_b is not None and job_b.repo_name == "acme/orphaned"
    # A comes back from the dead and releases with its STALE fence:
    # rejected — B still owns the job
    qa.release("acme/orphaned", "worker-a")
    assert qb.is_scheduled("acme/orphaned")
    # B's release (current fence) succeeds
    qb.release("acme/orphaned", "worker-b")
    assert not qb.is_scheduled("acme/orphaned")


def test_http_infinite_lease_matches_reference_drop_semantics(http_coord):
    """lease_s=0 restores the reference's behavior exactly: a claimed
    job whose worker died is never reclaimed (dropped in flight)."""
    from clickhub_spark.queue_http import HttpWorkQueue

    url, _ = http_coord
    q = HttpWorkQueue(url, lease_s=0)
    q.schedule("acme/forever")
    assert q.claim("w1").repo_name == "acme/forever"
    assert q.claim("w2") is None  # no expiry, ever
    assert q.is_scheduled("acme/forever")


def test_http_coordinator_snapshot_restart(http_coord, tmp_path):
    """A restarted coordinator resumes its queue from the snapshot:
    scheduled jobs survive; the fence counter keeps monotonic (a token
    issued before the crash can never be re-issued after)."""
    import threading as _threading

    from clickhub_spark.queue_http import HttpWorkQueue, make_coordinator

    url, coord = http_coord
    q = HttpWorkQueue(url)
    q.schedule("acme/durable", priority=5)
    q.schedule("acme/other")
    claimed = q.claim("w1")  # bumps the fence counter
    assert claimed.repo_name == "acme/durable"

    # "crash": start a SECOND coordinator from the same snapshot file
    srv2, coord2 = make_coordinator(
        snapshot_path=str(tmp_path / "queue.snap"), host="127.0.0.1"
    )
    _threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        q2 = HttpWorkQueue(f"http://127.0.0.1:{srv2.server_address[1]}")
        names = {j.repo_name for j in q2.list_jobs()}
        assert names == {"acme/durable", "acme/other"}  # state survived
        assert coord2._fence == coord._fence  # monotonic across restart
        job = q2.claim("w2")  # the unclaimed job is still claimable
        assert job.repo_name == "acme/other"
    finally:
        srv2.shutdown()
        srv2.server_close()
