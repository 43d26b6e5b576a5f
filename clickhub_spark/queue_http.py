"""Multi-node work queue — the KeeperMap analog made linearizable
ACROSS HOSTS (SURVEY §2.I5-I7; reference README.md:216-226).

The reference coordinates its worker fleet through ZooKeeper (the
KeeperMap engine): every claim CAS is decided by one replicated
coordination service, so workers on different machines can never
double-claim.  ``queue.py``'s two backends (filesystem rename-CAS,
sqlite WAL) are linearizable only as far as their medium is shared —
one host, or one POSIX filesystem.  This module closes the gap with
the same shape the reference uses: a COORDINATION SERVICE.

``QueueCoordinator`` is a stdlib ThreadingHTTPServer holding the
authoritative job table in memory behind ONE lock: every schedule /
claim / release is decided inside that critical section, giving a
single total order of operations — linearizability by construction,
exactly the role ZooKeeper plays for KeeperMap (single-coordinator
here; replicating the coordinator itself is what ZK's quorum adds,
and that seam is confined to this module).  State optionally
snapshots to disk (atomic rename) so a restarted coordinator resumes
its queue.

``HttpWorkQueue`` is the client — the same five-method protocol as
``WorkQueue``/``SqliteWorkQueue`` (schedule, is_scheduled, list_jobs,
claim, release) plus the shared ``work`` loop, so the entire
race-test suite runs unchanged against all three backends, and
workers need NOTHING but the coordinator URL (no shared filesystem,
no shared sqlite file).

Claim protocol over HTTP (reference repo/importer.py:136-158):

- insert-if-absent → server-side dict check under the lock
  (409 ≙ "Transaction failed (Node exists)", repo/schedule.py:60-63)
- claim CAS        → server assigns worker_id + a monotonically
  increasing FENCING TOKEN under the lock; exactly one racing client
  gets each job
- verify-read      → client re-GETs the job and checks owner+fence
  (mirrors repo/importer.py:148-155's read-after-write check)
- release          → server deletes ONLY if the caller's fencing
  token matches the current claim (a stale worker cannot delete a
  job that was reclaimed from it)

Dead-worker recovery — a documented IMPROVEMENT over the reference:
claims carry a lease (``lease_s``).  When a worker dies mid-import,
the reference simply loses the job (dropped, never retried —
repo/importer.py:174-175 "failed repos are dropped").  Here an
expired lease makes the job claimable again; the dead worker's late
release is fenced off by its stale token.  ``lease_s=0`` restores
the reference's drop-forever semantics (an infinite lease).

Slow-handler safety (round 9): a LIVE worker whose handler outruns
``lease_s`` must not look dead — ``HttpWorkQueue`` pings ``/renew``
from a heartbeat thread for the handler's whole duration (the
``_claim_guard`` hook in the shared work loop), extending the lease
under the same worker+fence match that gates release.  Renewal is
what distinguishes slow from dead: a dead worker stops heartbeating
and its lease lapses.  If renewal cannot run (a worker driving the
claim/release protocol by hand), ``lease_s`` must exceed the
worst-case job duration — or use ``lease_s=0``.

Security posture: the coordinator binds loopback by DEFAULT; a
non-loopback deployment should set ``token=...`` — every request
must then carry it in ``X-Queue-Token`` (an unauthenticated peer
could otherwise drain the queue, fence-break releases, or fill it).
The token check is constant-time (``hmac.compare_digest``), but the
token travels in a plaintext header: non-loopback deployments should
also run behind TLS or a trusted network.
"""

from __future__ import annotations

import contextlib
import hmac
import http.client
import json
import logging
import os
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Sequence

from clickhub_spark.queue import AlreadyScheduled, Job, QueueFull, _WorkLoop

_LOG = logging.getLogger(__name__)

__all__ = ["QueueCoordinator", "HttpWorkQueue", "make_coordinator"]

#: default claim lease: generous for a git-import job; 0 = never
#: expires (the reference's drop-forever behavior)
DEFAULT_LEASE_S = 300.0


class QueueCoordinator:
    """Authoritative queue state + the HTTP server that serializes all
    operations on it.  Start with ``make_coordinator(...)`` or embed
    via ``attach(server)``."""

    def __init__(
        self,
        max_queue_length: int = 10_000,
        snapshot_path: str | None = None,
        standby: bool = False,
    ):
        self.max_queue_length = max_queue_length
        self.snapshot_path = snapshot_path
        self._lock = threading.Lock()
        # repo_name -> {job fields..., fence, lease_deadline, reclaims}
        self._jobs: dict[str, dict] = {}
        self._fence = 0  # monotonic across ALL claims; never reused
        #: set by election.Elector when one manages this coordinator;
        #: /health then exposes its status() (VERDICT r11 #8)
        self.elector = None
        # a warm standby neither loads the snapshot at construction
        # (it would go stale while the primary keeps writing) nor
        # serves/writes anything until promote(); see make_coordinator
        self.serving = not standby
        if self.serving:
            self.reload_from_snapshot()

    def promote(self) -> None:
        """Warm-standby takeover: load the shared snapshot ledger
        (complete by snapshot-before-ack) and start serving.  The
        caller must have confirmed the primary dead first — see the
        single-writer invariant in ``make_coordinator``."""
        self.reload_from_snapshot()
        self.serving = True

    # -- state ops: each runs entirely inside the lock → one total
    # -- order of operations = linearizable by construction ------------

    def _snapshot_locked(self) -> None:
        if not self.snapshot_path:
            return
        tmp = self.snapshot_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"jobs": self._jobs, "fence": self._fence}, f)
        os.replace(tmp, self.snapshot_path)  # atomic: never half-written

    def schedule(self, repo_name: str, priority: int = 0) -> dict:
        with self._lock:
            if repo_name in self._jobs:
                raise AlreadyScheduled(repo_name)
            if len(self._jobs) >= self.max_queue_length:
                raise QueueFull(f"queue holds {self.max_queue_length} jobs")
            rec = {
                "repo_name": repo_name,
                "priority": priority,
                "scheduled": time.time(),
                "started_time": 0.0,
                "worker_id": "",
                "fence": 0,
                "lease_deadline": 0.0,
                "reclaims": 0,
            }
            self._jobs[repo_name] = rec
            self._snapshot_locked()
            return dict(rec)

    def claim(
        self,
        worker_id: str,
        retries: int = 2,
        lease_s: float = DEFAULT_LEASE_S,
        repo_name: str | None = None,
        strict: bool = False,
    ) -> dict | None:
        """Hand the best claimable job to ``worker_id`` with a fresh
        fencing token.  Claimable = unclaimed, OR claimed but lease
        expired (the dead-worker recovery path — divergence from the
        reference's drop-forever, documented in the module header).
        ``repo_name`` narrows to a key-SPECIFIC claim (the literal
        conditional-UPDATE shape, repo/importer.py:146-147).
        ``strict`` requires ``worker_id == ''`` and IGNORES lease
        expiry — the exact conditional-UPDATE CAS the file and sqlite
        backends implement for claim_key, so ``… WHERE worker_id=''``
        returns the same claimed-count on every backend (ADVICE
        r13)."""
        now = time.time()
        with self._lock:
            free = [
                r
                for r in self._jobs.values()
                if (
                    r["worker_id"] == ""
                    or (
                        not strict
                        and r["lease_deadline"]
                        and r["lease_deadline"] <= now
                    )
                )
                and (repo_name is None or r["repo_name"] == repo_name)
            ]
            free.sort(key=lambda r: (-r["priority"], r["scheduled"], r["repo_name"]))
            for rec in free[:retries]:
                if rec["worker_id"]:
                    rec["reclaims"] += 1  # lease expired: reclaim
                self._fence += 1
                rec["worker_id"] = worker_id
                rec["started_time"] = now
                rec["fence"] = self._fence
                rec["lease_deadline"] = (now + lease_s) if lease_s else 0.0
                self._snapshot_locked()
                return dict(rec)
            return None

    def renew(
        self,
        repo_name: str,
        worker_id: str,
        fence: int,
        lease_s: float = DEFAULT_LEASE_S,
    ) -> bool:
        """Extend the caller's lease — only while it still owns the
        claim (worker AND fencing token match, same gate as release).
        An expired-but-not-yet-reclaimed claim may renew: ownership
        changes only at reclaim, and the matching fence proves none
        has happened.  After a reclaim the old owner's renew fails,
        telling a slow worker it has lost the job."""
        now = time.time()
        with self._lock:
            rec = self._jobs.get(repo_name)
            if (
                rec is None
                or rec["worker_id"] != worker_id
                or rec["fence"] != fence
            ):
                return False
            rec["lease_deadline"] = (now + lease_s) if lease_s else 0.0
            self._snapshot_locked()
            return True

    def release(self, repo_name: str, worker_id: str, fence: int = 0) -> bool:
        """Delete the job — but only if the caller still owns it.  An
        unclaimed job releases unconditionally (parity with the other
        backends); a claimed one requires worker AND fencing-token
        match, so a worker whose lease expired and whose job was
        reclaimed cannot delete the new owner's work."""
        with self._lock:
            rec = self._jobs.get(repo_name)
            if rec is None:
                return False
            if rec["worker_id"] and not (
                rec["worker_id"] == worker_id and rec["fence"] == fence
            ):
                return False
            del self._jobs[repo_name]
            self._snapshot_locked()
            return True

    def reload_from_snapshot(self) -> None:
        """Replace in-memory state from the snapshot file — the warm-
        standby promotion step.  Every mutation snapshots BEFORE its
        ack leaves the primary (snapshot-before-ack), so the file is
        a complete ledger of acknowledged operations: a standby that
        loads it at promote time resumes the exact acknowledged state,
        including the monotonic fence counter (stale pre-crash owners
        stay fenced off)."""
        with self._lock:
            if self.snapshot_path and os.path.exists(self.snapshot_path):
                with open(self.snapshot_path) as f:
                    snap = json.load(f)
                self._jobs = snap["jobs"]
                self._fence = snap["fence"]

    def jobs(self) -> list[dict]:
        with self._lock:
            return [dict(r) for r in self._jobs.values()]

    def get(self, repo_name: str) -> dict | None:
        with self._lock:
            rec = self._jobs.get(repo_name)
            return dict(rec) if rec else None


def make_coordinator(
    max_queue_length: int = 10_000,
    snapshot_path: str | None = None,
    host: str = "127.0.0.1",
    port: int = 0,
    token: str | None = None,
    standby: bool = False,
) -> tuple[ThreadingHTTPServer, QueueCoordinator]:
    """Build (without starting) the coordination server; ``port=0``
    binds an ephemeral port.  Run with ``server.serve_forever()`` (a
    daemon thread in tests, a dedicated process in a deployment).

    Binds LOOPBACK by default: exposing the queue on a routable
    interface without ``token`` would let any network peer drain,
    fence-break, or fill it.  Pass ``host="0.0.0.0"`` together with a
    shared ``token`` for a real fleet — every request must then carry
    ``X-Queue-Token: <token>`` (``HttpWorkQueue(token=...)`` does).

    ``standby=True`` starts a WARM STANDBY (VERDICT r9 item 6): the
    server binds and answers ``GET /health`` but refuses every queue
    operation with 503 until an authed ``POST /promote``, which loads
    the shared snapshot file (complete by snapshot-before-ack) and
    starts serving.  Failover is: confirm the primary dead → promote
    → re-point the fleet (``HttpWorkQueue.repoint`` keeps fencing
    tokens, so in-flight claims survive).  SINGLE-WRITER INVARIANT:
    the operator must promote only after the primary is truly dead —
    two coordinators serving the same snapshot path would
    last-writer-win each other's ledgers.  Automating that decision
    (quorum election) is exactly what the reference's ZooKeeper
    deployment buys; this seam keeps the same snapshot-ledger
    protocol so a ZK/Raft election can drive ``/promote`` unchanged."""
    coord = QueueCoordinator(max_queue_length, snapshot_path, standby=standby)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _authed(self) -> bool:
            # constant-time compare (ADVICE r9 #4): on the documented
            # non-loopback deployment (host=0.0.0.0 + token) a plain
            # == is timing-observable; such deployments should also
            # sit behind TLS or a trusted network — the token itself
            # travels in a plaintext header
            got = self.headers.get("X-Queue-Token")
            if token is None or (
                got is not None and hmac.compare_digest(got, token)
            ):
                return True
            self._json(401, {"error": "bad or missing X-Queue-Token"})
            return False

        def _serving(self) -> bool:
            if coord.serving:
                return True
            self._json(503, {"error": "standby", "detail": "not promoted"})
            return False

        def do_GET(self):  # noqa: N802 (http.server API name)
            if self.path == "/health":
                # unauthed liveness probe: safe (no queue state) and
                # what a failover supervisor polls on both roles.
                # With an elector attached, election telemetry rides
                # along so an operator can tell "no leader" from
                # "leader renewing" without reading epoch files.
                doc = {"serving": coord.serving}
                if coord.elector is not None:
                    doc["election"] = coord.elector.status()
                self._json(200, doc)
                return
            if not self._authed() or not self._serving():
                return
            if self.path == "/jobs":
                self._json(200, {"jobs": coord.jobs()})
            elif self.path.startswith("/job?repo="):
                from urllib.parse import unquote

                rec = coord.get(unquote(self.path[len("/job?repo=") :]))
                self._json(200 if rec else 404, {"job": rec})
            else:
                self.send_error(404)

        def do_POST(self):  # noqa: N802
            if not self._authed():
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._json(400, {"error": "bad json"})
                return
            if self.path == "/promote":
                # takeover order (single-writer invariant: caller has
                # confirmed the primary dead): load the ledger, serve
                coord.promote()
                self._json(200, {"serving": True})
                return
            if not self._serving():
                return
            try:
                if self.path == "/schedule":
                    rec = coord.schedule(
                        body["repo_name"], int(body.get("priority", 0))
                    )
                    self._json(201, {"job": rec})
                elif self.path == "/claim":
                    rec = coord.claim(
                        body["worker_id"],
                        int(body.get("retries", 2)),
                        float(body.get("lease_s", DEFAULT_LEASE_S)),
                        body.get("repo_name"),
                        bool(body.get("strict", False)),
                    )
                    self._json(200 if rec else 204, {"job": rec})
                elif self.path == "/renew":
                    ok = coord.renew(
                        body["repo_name"],
                        body["worker_id"],
                        int(body.get("fence", 0)),
                        float(body.get("lease_s", DEFAULT_LEASE_S)),
                    )
                    self._json(200, {"renewed": ok})
                elif self.path == "/release":
                    ok = coord.release(
                        body["repo_name"],
                        body["worker_id"],
                        int(body.get("fence", 0)),
                    )
                    self._json(200, {"released": ok})
                else:
                    self.send_error(404)
            except AlreadyScheduled as e:
                self._json(409, {"error": "already_scheduled", "repo": str(e)})
            except QueueFull as e:
                self._json(403, {"error": "queue_full", "detail": str(e)})

        def log_message(self, *args):  # keep worker logs clean
            pass

    return ThreadingHTTPServer((host, port), Handler), coord


class HttpWorkQueue(_WorkLoop):
    """Client for ``QueueCoordinator`` — same protocol surface as the
    filesystem and sqlite backends, so one test suite covers all
    three.  Needs only ``base_url``: no shared filesystem, no shared
    database file, workers can run on any host that reaches the
    coordinator."""

    def __init__(
        self,
        base_url: str,
        max_queue_length: int = 10_000,
        lease_s: float = DEFAULT_LEASE_S,
        timeout: float = 30.0,
        token: str | None = None,
        failover_urls: Sequence[str] = (),
    ):
        self.base_url = base_url.rstrip("/")
        # advisory only — enforcement is server-side (the coordinator
        # is the single authority; a client-side count would race)
        self.max_queue_length = max_queue_length
        self.lease_s = lease_s
        self.timeout = timeout
        self.token = token
        #: candidate coordinators for AUTOMATIC repoint: on a
        #: transport failure or a 503-standby answer, the client
        #: probes /health across base+failovers and repoints to the
        #: serving one (fencing tokens preserved — repoint()).  Pair
        #: with election.Elector on the coordinators for hands-off
        #: failover.
        self.failover_urls = [u.rstrip("/") for u in failover_urls]
        self._fences: dict[tuple[str, str], int] = {}

    def repoint(self, base_url: str) -> None:
        """Re-point this client at a promoted standby coordinator.
        Keeps the fencing tokens of in-flight claims — the standby
        resumed the primary's acknowledged ledger (same fences), so a
        worker mid-handler renews and releases under its pre-failover
        token; a NEW client object would start fence-blind and get
        fenced off its own claims."""
        self.base_url = base_url.rstrip("/")

    def _request(self, base: str, path: str, body: dict | None = None):
        url = base + path
        headers = {} if self.token is None else {"X-Queue-Token": self.token}
        if body is None:
            req = urllib.request.Request(url, headers=headers)
        else:
            req = urllib.request.Request(
                url,
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json", **headers},
                method="POST",
            )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if resp.status == 204:
                    return resp.status, {}
                return resp.status, json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            payload = e.read()
            try:
                return e.code, json.loads(payload or b"{}")
            except json.JSONDecodeError:
                return e.code, {"error": payload.decode(errors="replace")}

    def _failover(self) -> bool:
        """Probe /health across base + failover candidates; repoint to
        the first SERVING coordinator that is not the current base.
        Never raises (each probe failure just skips the candidate)."""
        if not self.failover_urls:
            return False
        for cand in [self.base_url, *self.failover_urls]:
            try:
                code, body = self._request(cand, "/health")
            except (
                urllib.error.URLError,
                OSError,
                http.client.HTTPException,
            ):
                continue
            if code == 200 and body.get("serving"):
                if cand != self.base_url:
                    _LOG.warning(
                        "repointing to promoted coordinator %s", cand
                    )
                    self.repoint(cand)
                    return True
                return False  # current base is fine after all
        return False

    def _call(self, path: str, body: dict | None = None):
        try:
            code, resp = self._request(self.base_url, path, body)
        except (urllib.error.URLError, OSError, http.client.HTTPException):
            # dead/unreachable coordinator: one failover attempt, then
            # let the caller's retry posture handle it
            if not self._failover():
                raise
            return self._request(self.base_url, path, body)
        if (
            code == 503
            and isinstance(resp, dict)
            and resp.get("error") == "standby"
            and self._failover()
        ):
            # a deposed/unpromoted coordinator answered: retry against
            # the serving one
            return self._request(self.base_url, path, body)
        return code, resp

    @staticmethod
    def _to_job(rec: dict) -> Job:
        return Job(
            rec["repo_name"],
            rec["priority"],
            rec["scheduled"],
            rec["started_time"],
            rec["worker_id"],
        )

    def schedule(self, repo_name: str, priority: int = 0) -> Job:
        code, body = self._call(
            "/schedule", {"repo_name": repo_name, "priority": priority}
        )
        if code == 409:
            raise AlreadyScheduled(repo_name)
        if code == 403:
            raise QueueFull(body.get("detail", "queue full"))
        if code != 201:
            raise RuntimeError(f"schedule failed: {code} {body}")
        return self._to_job(body["job"])

    def is_scheduled(self, repo_name: str) -> bool:
        from urllib.parse import quote

        code, _ = self._call(f"/job?repo={quote(repo_name, safe='')}")
        return code == 200

    def list_jobs(self) -> list[Job]:
        code, body = self._call("/jobs")
        if code != 200:
            raise RuntimeError(f"list_jobs failed: {code} {body}")
        return sorted(
            (self._to_job(r) for r in body["jobs"]), key=lambda j: j.repo_name
        )

    def claim_key(self, repo_name: str, worker_id: str) -> Job | None:
        """Key-specific optimistic claim (see WorkQueue.claim_key) —
        the /claim endpoint narrowed to one repo_name, in STRICT mode:
        only ``worker_id == ''`` is claimable, lease expiry ignored,
        matching the file/sqlite conditional-UPDATE CAS exactly
        (ADVICE r13 — backends must agree on 'claimed 0' vs
        'claimed 1' for the same statement)."""
        return self.claim(
            worker_id, retries=1, _repo_name=repo_name, _strict=True
        )

    def claim(
        self,
        worker_id: str,
        retries: int = 2,
        _repo_name: str | None = None,
        _strict: bool = False,
    ) -> Job | None:
        req = {"worker_id": worker_id, "retries": retries, "lease_s": self.lease_s}
        if _repo_name is not None:
            req["repo_name"] = _repo_name
        if _strict:
            req["strict"] = True
        code, body = self._call("/claim", req)
        if code == 204 or not body.get("job"):
            return None
        rec = body["job"]
        self._fences[(rec["repo_name"], worker_id)] = rec["fence"]
        # verify-read (repo/importer.py:148-155): confirm the claim is
        # visible and still ours before doing any work
        from urllib.parse import quote

        vcode, vbody = self._call(f"/job?repo={quote(rec['repo_name'], safe='')}")
        cur = (vbody or {}).get("job") or {}
        if vcode != 200 or cur.get("worker_id") != worker_id or cur.get("fence") != rec["fence"]:
            # claim not confirmed: forget the fence (the lease will
            # expire server-side; holding the entry would only leak)
            self._fences.pop((rec["repo_name"], worker_id), None)
            return None
        return self._to_job(rec)

    def _renew_status(self, repo_name: str, worker_id: str) -> tuple[int, bool]:
        """(http_status, renewed).  Only a 200 is AUTHORITATIVE about
        claim ownership; 503 (unpromoted standby), 401, or a proxy
        5xx says nothing about the lease — callers that must not
        abandon a live claim (the heartbeat) retry on those."""
        fence = self._fences.get((repo_name, worker_id), 0)
        code, body = self._call(
            "/renew",
            {
                "repo_name": repo_name,
                "worker_id": worker_id,
                "fence": fence,
                "lease_s": self.lease_s,
            },
        )
        return code, code == 200 and bool(body.get("renewed"))

    def renew(self, repo_name: str, worker_id: str) -> bool:
        """Extend this worker's lease on a claimed job.  False means
        the renewal did not happen — authoritatively lost (reclaimed/
        released) OR the coordinator could not confirm it; use
        ``_renew_status`` to tell the two apart."""
        return self._renew_status(repo_name, worker_id)[1]

    #: every Nth consecutive failed/non-authoritative heartbeat emits
    #: one warning — a permanently unreachable or misconfigured
    #: coordinator (rolled token → endless 401, repointed URL → 404)
    #: should be VISIBLE, not a silent daemon spin (ADVICE r10 #3)
    BEAT_WARN_EVERY = 10

    def _beat_miss(self, job, misses: int, why: str) -> int:
        misses += 1
        if misses % self.BEAT_WARN_EVERY == 0:
            _LOG.warning(
                "heartbeat for %s: %d consecutive non-authoritative "
                "renew attempts (last: %s) — coordinator unreachable "
                "or misconfigured; lease may lapse and the job may be "
                "reclaimed while this handler is still running",
                job.repo_name,
                misses,
                why,
            )
        return misses

    @contextlib.contextmanager
    def _claim_guard(self, job, worker_id: str):
        """Heartbeat for the shared work loop: ping /renew at a third
        of the lease period while the handler runs, so a SLOW worker
        never looks dead (without this, a handler outliving lease_s
        gets its job reclaimed and double-executed — ADVICE r8 item
        1).  lease_s=0 is an infinite lease: nothing to renew."""
        if not self.lease_s:
            yield
            return
        stop = threading.Event()

        def beat() -> None:
            interval = max(self.lease_s / 3.0, 0.02)
            misses = 0  # consecutive non-authoritative renew attempts
            while not stop.wait(interval):
                try:
                    code, renewed = self._renew_status(
                        job.repo_name, worker_id
                    )
                except (urllib.error.URLError, OSError, http.client.HTTPException):
                    # transient transport failure (coordinator
                    # crash/restart mid-failover — a supported state,
                    # ADVICE r9 #2; HTTPException covers a coordinator
                    # killed MID-RESPONSE: BadStatusLine/IncompleteRead
                    # are not OSErrors and urllib does not wrap them
                    # in URLError): keep the heartbeat ALIVE and
                    # retry next interval; dying here silently lapses
                    # the lease under a running handler and invites a
                    # double-execute on reclaim
                    misses = self._beat_miss(job, misses, "transport")
                    continue
                if code != 200:
                    # non-authoritative HTTP status (503 unpromoted
                    # standby mid-failover, 401 during a token roll,
                    # proxy 5xx): says nothing about the lease — same
                    # retry posture as a transport error
                    misses = self._beat_miss(job, misses, f"http {code}")
                    continue
                misses = 0
                if not renewed:
                    return  # claim lost/released: stop heartbeating
        t = threading.Thread(target=beat, daemon=True)
        t.start()
        try:
            yield
        finally:
            stop.set()
            t.join(timeout=self.timeout)

    def release(self, repo_name: str, worker_id: str) -> None:
        fence = self._fences.pop((repo_name, worker_id), 0)
        self._call(
            "/release",
            {"repo_name": repo_name, "worker_id": worker_id, "fence": fence},
        )
