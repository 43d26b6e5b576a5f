"""Work-queue semantics — the KeeperMap analog (SURVEY §2.I5-I7).

The reference coordinates distributed workers through a ZooKeeper-
backed KV table: uniqueness on insert ("Transaction failed (Node
exists)" → AlreadyScheduled, reference repo/schedule.py:60-63),
optimistic claim via conditional UPDATE + verify-read (reference
repo/importer.py:136-158, keeper_map_strict_mode=1
clickhouse/__init__.py:33-35), point DELETE to release
(repo/importer.py:175).

Here the queue is a directory of one-file-per-job JSON records, and
every CAS primitive maps to an atomic filesystem operation:

- insert-if-absent  → ``open(O_CREAT|O_EXCL)``  (Node-exists analog)
- claim CAS         → ``os.rename(job, job.claimed.<worker>)`` —
  rename is atomic; exactly one racing worker's rename succeeds
- verify-read       → stat the claimed path + re-read owner field
  (mirrors repo/importer.py:148-155's read-after-write check)
- release           → unlink (delete-even-on-failure semantics,
  repo/importer.py:174-175)

This is deliberately a tiny driver-local coordination state, NOT a
dataframe job: the reference holds ≤10,000 queue rows
(config.yml:11) against 128k repos — coordination state is small by
design and does not belong on the executors.  The documented
scale-out seam (SURVEY §7 M4 hard part #2): swap the directory for
any linearizable KV (the operations used are exactly put-if-absent /
compare-and-swap / delete).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


class AlreadyScheduled(Exception):
    """≙ KeeperMap 'Transaction failed (Node exists)' (repo/schedule.py:62)."""


class QueueFull(Exception):
    """≙ max_queue_length check (repo/schedule.py:30-32, config.yml:11)."""


@dataclass
class Job:
    repo_name: str
    priority: int = 0
    scheduled: float = 0.0
    started_time: float = 0.0
    worker_id: str = ""


def _safe(name: str) -> str:
    return name.replace("/", "%2F")


class WorkQueue:
    """Filesystem-CAS job queue with the reference's claim protocol."""

    def __init__(self, root: str, max_queue_length: int = 10_000):
        self.root = root
        self.max_queue_length = max_queue_length
        os.makedirs(root, exist_ok=True)

    # -- schedule (reference repo/schedule.py:37-67) ---------------------

    def schedule(self, repo_name: str, priority: int = 0) -> Job:
        if len(self.list_jobs()) >= self.max_queue_length:
            raise QueueFull(f"queue holds {self.max_queue_length} jobs")
        # A claimed job lives at <repo>.job.claimed.<worker>, so the
        # O_EXCL insert below would not see it — check in-flight claims
        # first, matching the reference where the KeeperMap row persists
        # until the post-import DELETE (repo/importer.py:175): scheduling
        # a repo whose import is running must fail, or two workers can
        # import the same repo concurrently.
        if self.is_scheduled(repo_name):
            raise AlreadyScheduled(repo_name)
        job = Job(repo_name, priority, scheduled=time.time())
        path = os.path.join(self.root, _safe(repo_name) + ".job")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise AlreadyScheduled(repo_name) from e
        with os.fdopen(fd, "w") as f:
            json.dump(job.__dict__, f)
        return job

    def is_scheduled(self, repo_name: str) -> bool:
        base = os.path.join(self.root, _safe(repo_name))
        if os.path.exists(base + ".job"):
            return True
        return any(
            p.startswith(_safe(repo_name) + ".job.claimed.") for p in os.listdir(self.root)
        )

    def list_jobs(self) -> list[Job]:
        jobs = []
        for p in sorted(os.listdir(self.root)):
            if ".job" not in p:
                continue
            try:
                with open(os.path.join(self.root, p)) as f:
                    jobs.append(Job(**json.load(f)))
            except (FileNotFoundError, json.JSONDecodeError):
                continue  # racing claim/release — skip, like a stale read
        return jobs

    # -- claim (reference repo/importer.py:136-158) ----------------------

    def claim(self, worker_id: str, retries: int = 2) -> Job | None:
        """Candidate scan ORDER BY priority DESC, started_time ASC
        LIMIT ``retries`` (repo/importer.py:138-139), then optimistic
        CAS + verify-read per candidate."""
        unclaimed = [j for j in self.list_jobs() if j.worker_id == ""]
        unclaimed.sort(key=lambda j: (-j.priority, j.scheduled, j.repo_name))
        for job in unclaimed[:retries]:
            src = os.path.join(self.root, _safe(job.repo_name) + ".job")
            dst = src + f".claimed.{worker_id}"
            try:
                os.rename(src, dst)  # the CAS: exactly one renamer wins
            except FileNotFoundError:
                continue  # lost the race (≙ KeeperMap rejecting the UPDATE)
            job.worker_id = worker_id
            job.started_time = time.time()
            with open(dst, "w") as f:
                json.dump(job.__dict__, f)
            # verify-read (repo/importer.py:148-155): confirm ownership
            with open(dst) as f:
                if json.load(f)["worker_id"] == worker_id:
                    return job
        return None

    # -- release (reference repo/importer.py:175) ------------------------

    def release(self, repo_name: str, worker_id: str) -> None:
        """DELETE the job whether the import succeeded or not — failed
        repos are dropped, not retried (repo/importer.py:174 comment)."""
        for suffix in (f".job.claimed.{worker_id}", ".job"):
            path = os.path.join(self.root, _safe(repo_name) + suffix)
            try:
                os.unlink(path)
                return
            except FileNotFoundError:
                continue

    # -- worker loop (reference repo/importer.py:161-179) ----------------

    def work(self, worker_id: str, handler, max_polls: int = 1, sleep_time: float = 0.0):
        """Poll → claim → handle → always release (I7).

        Handler failures are swallowed like the reference worker loop
        (repo/importer.py:161-179 keeps the worker alive; the job is
        dropped, not retried — comment repo/importer.py:174).  Failed
        repo names are recorded on ``self.failures``.
        """
        done = []
        self.failures: list[tuple[str, str]] = []
        for _ in range(max_polls):
            job = self.claim(worker_id)
            if job is None:
                if sleep_time:
                    time.sleep(sleep_time)
                continue
            try:
                handler(job)
                done.append(job.repo_name)
            except Exception as e:  # dropped, not retried
                self.failures.append((job.repo_name, repr(e)))
            finally:
                self.release(job.repo_name, worker_id)
        return done
