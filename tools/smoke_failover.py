"""Cross-PROCESS automated-failover drill (round 11): two coordinator
OS processes via the CLI (`python -m clickhub_spark coordinator`)
sharing a snapshot ledger and a lease dir; a worker in this process
claims a job with a slow handler; the primary is SIGKILLed
mid-handler.  The standby's elector must win the next epoch and
self-promote, the worker's heartbeat must auto-repoint via
failover_urls, and the job must complete exactly once.

This is the drill the in-process test (tests/test_election.py) cannot
fully perform: real process death (no graceful shutdown), the lease
file as the only cross-process signal, and CLI wiring end to end.

Prints one JSON line.
"""

from __future__ import annotations

import json
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

LEASE_S = 0.8


def _health(url: str) -> dict:
    with urllib.request.urlopen(url + "/health", timeout=2) as r:
        return json.loads(r.read())


def _wait_health(url: str, timeout: float = 10.0) -> dict:
    deadline = time.monotonic() + timeout
    last: Exception | None = None
    while time.monotonic() < deadline:
        try:
            return _health(url)
        except OSError as exc:
            last = exc
            time.sleep(0.1)
    raise RuntimeError(f"{url} never came up: {last}")


def main() -> int:
    from clickhub_spark.queue_http import HttpWorkQueue

    out: dict = {"metric": "failover_smoke", "lease_s": LEASE_S}
    with tempfile.TemporaryDirectory() as td:
        snap = f"{td}/queue.snap"
        lease = f"{td}/lease"
        base = [sys.executable, "-m", "clickhub_spark", "coordinator",
                "--snapshot", snap, "--lease-dir", lease,
                "--lease-s", str(LEASE_S), "--host", "127.0.0.1"]
        p1 = subprocess.Popen(
            base + ["--port", "18451", "--node-id", "primary"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        p2 = subprocess.Popen(
            base + ["--port", "18452", "--node-id", "standby", "--standby"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        url1, url2 = "http://127.0.0.1:18451", "http://127.0.0.1:18452"
        try:
            h1 = _wait_health(url1)
            assert h1["serving"] is True
            # the primary's elector claims epoch 1 at start(); /health
            # must expose it (VERDICT r11 #8: operators distinguish
            # "no leader" from "leader renewing" via /health alone)
            el1 = h1.get("election") or _wait_health(url1)["election"]
            assert el1["role"] == "leader" and el1["epoch"] >= 1, el1
            out["pre_kill_election"] = el1
            h2 = _wait_health(url2)
            assert h2["serving"] is False
            assert h2["election"]["role"] == "follower", h2
            q = HttpWorkQueue(url1, lease_s=0.5, failover_urls=[url2])
            q.schedule("acme/kill9")
            executions: list[str] = []
            t_kill = [0.0]

            def handler(job) -> None:
                executions.append(job.repo_name)
                time.sleep(0.3)
                p1.send_signal(signal.SIGKILL)  # no goodbye
                t_kill[0] = time.monotonic()
                # outlive expiry + grace + promotion
                time.sleep(8 * LEASE_S)

            t0 = time.time()
            done = q.work("w-kill9", handler)
            out["work_sec"] = round(time.time() - t0, 2)
            h2 = _health(url2)
            out["standby_serving"] = h2["serving"]
            out["post_takeover_election"] = h2.get("election")
            out["completed"] = done
            out["executions"] = executions
            out["failures"] = q.failures
            out["repointed"] = q.base_url == url2
            el2 = h2.get("election") or {}
            out["ok"] = (
                done == ["acme/kill9"]
                and executions == ["acme/kill9"]
                and not q.failures
                and h2["serving"] is True
                and q.base_url == url2
                # takeover telemetry: the standby won a HIGHER epoch,
                # /health says so, and its lease is actively renewed
                and el2.get("role") == "leader"
                and el2.get("epoch", 0) > el1["epoch"]
                and el2.get("cluster_owner") == "standby"
                and el2.get("lease_valid") is True
            )
        finally:
            for proc in (p1, p2):
                if proc.poll() is None:
                    proc.kill()
                proc.wait(timeout=10)
    print(json.dumps(out))
    return 0 if out.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
