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


@pytest.fixture(params=["fs", "sqlite"])
def make_queue(request, tmp_path):
    """Every test runs against BOTH backends — the filesystem-CAS queue
    and the sqlite-WAL queue share one claim-protocol contract."""

    def make(max_queue_length=10_000):
        if request.param == "fs":
            return WorkQueue(str(tmp_path / "q"), max_queue_length)
        return SqliteWorkQueue(str(tmp_path / "q.db"), max_queue_length)

    return make


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
