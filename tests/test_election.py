"""Filesystem-lease coordinator election (clickhub_spark/election.py):
exactly-one-winner, automatic standby promotion on leader death with
worker auto-repoint (exactly-once preserved), and higher-epoch
fencing of a deposed leader."""

from __future__ import annotations

import threading
import time

from clickhub_spark.election import Elector, FileLease
from clickhub_spark.queue_http import HttpWorkQueue, make_coordinator


def _spin(pred, timeout, step=0.05):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(step)
    return pred()


def test_election_exactly_one_winner(tmp_path):
    """Two cold standbys, one lease dir: exactly one wins epoch 1 and
    starts serving; the other stays a follower."""
    snap = str(tmp_path / "q.snap")
    lease_dir = str(tmp_path / "lease")
    coords = []
    electors = []
    for i in range(2):
        _, coord = make_coordinator(
            snapshot_path=snap, host="127.0.0.1", standby=True
        )
        coords.append(coord)
        electors.append(
            Elector(coord, lease_dir, f"n{i}", lease_s=0.4).start()
        )
    try:
        assert _spin(lambda: sum(c.serving for c in coords) == 1, 3.0)
        time.sleep(0.6)  # a second election must NOT happen
        assert sum(c.serving for c in coords) == 1
        winners = [e for e in electors if e.epoch > 0]
        assert len(winners) == 1 and winners[0].epoch == 1
    finally:
        for e in electors:
            e.stop()


def test_deposed_leader_steps_down(tmp_path):
    """A higher epoch appearing in the lease dir (a rival won while
    this leader was partitioned) fences the old leader at its next
    renew tick."""
    snap = str(tmp_path / "q.snap")
    lease_dir = str(tmp_path / "lease")
    _, coord = make_coordinator(snapshot_path=snap, host="127.0.0.1")
    el = Elector(coord, lease_dir, "old", lease_s=0.4).start()
    try:
        assert coord.serving and el.epoch == 1
        FileLease(lease_dir, "rival", 60.0).try_acquire(2)
        assert _spin(lambda: not coord.serving, 2.0)
        assert el.epoch == 0
    finally:
        el.stop()


def test_renew_write_then_verify(tmp_path):
    """ADVICE r11: renew is no longer check-then-write.  A leader
    whose pre-check passes but whose epoch is superseded before (or
    while) the write lands must see renew() == False — simulated by
    making the rival's higher epoch appear between the pre-check and
    the post-write verify."""
    lease_dir = str(tmp_path / "lease")
    mine = FileLease(lease_dir, "old-leader", 60.0)
    assert mine.try_acquire(1)
    assert mine.renew(1) is True  # healthy path

    rival = FileLease(lease_dir, "rival", 60.0)
    calls = {"n": 0}
    real_highest = mine.highest_epoch

    def paused_highest():
        calls["n"] += 1
        if calls["n"] == 1:
            return 1  # pre-check: pause happens AFTER this read
        return real_highest()  # post-write verify sees the takeover

    mine.highest_epoch = paused_highest
    assert rival.try_acquire(2)  # takeover lands during the pause
    assert mine.renew(1) is False  # write-then-verify catches it
    assert calls["n"] == 2
    # the stale write landed in epoch_1 only; the cluster view is
    # untouched (followers read the highest epoch)
    epoch, owner, _ = rival.current()
    assert (epoch, owner) == (2, "rival")


def test_status_and_health_telemetry(tmp_path):
    """VERDICT r11 #8: Elector.status() rides on /health so an
    operator can distinguish "no leader" from "leader renewing"
    without reading epoch files."""
    import json
    import urllib.request

    snap = str(tmp_path / "q.snap")
    lease_dir = str(tmp_path / "lease")
    srv, coord = make_coordinator(snapshot_path=snap, host="127.0.0.1")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    el = Elector(coord, lease_dir, "n1", lease_s=0.5).start()
    try:
        with urllib.request.urlopen(url + "/health", timeout=2) as r:
            doc = json.loads(r.read())
        e = doc["election"]
        assert doc["serving"] is True
        assert e["role"] == "leader" and e["epoch"] == 1
        assert e["lease_valid"] is True
        assert e["cluster_epoch"] == 1 and e["cluster_owner"] == "n1"
        assert e["lease_expires_in_s"] > 0

        # depose: a rival's higher epoch flips the telemetry to
        # follower at the next renew tick
        FileLease(lease_dir, "rival", 60.0).try_acquire(2)
        assert _spin(lambda: not coord.serving, 2.0)
        with urllib.request.urlopen(url + "/health", timeout=2) as r:
            doc = json.loads(r.read())
        e = doc["election"]
        assert doc["serving"] is False
        assert e["role"] == "follower" and e["epoch"] == 0
        assert e["lease_valid"] is False
        assert e["cluster_epoch"] == 2 and e["cluster_owner"] == "rival"
    finally:
        el.stop()
        srv.shutdown()
        srv.server_close()


def test_auto_failover_end_to_end(tmp_path):
    """The full hands-off failover: primary dies mid-handler, its
    elector stops renewing, the standby's elector wins the next epoch
    and promotes from the shared ledger, and the worker's heartbeat
    auto-repoints via failover_urls — the job completes EXACTLY once
    under its original fencing token."""
    snap = str(tmp_path / "q.snap")
    lease_dir = str(tmp_path / "lease")
    lease = 0.6

    srv1, coord1 = make_coordinator(snapshot_path=snap, host="127.0.0.1")
    threading.Thread(target=srv1.serve_forever, daemon=True).start()
    url1 = f"http://127.0.0.1:{srv1.server_address[1]}"
    el1 = Elector(coord1, lease_dir, "primary", lease_s=lease).start()

    srv2, coord2 = make_coordinator(
        snapshot_path=snap, host="127.0.0.1", standby=True
    )
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    url2 = f"http://127.0.0.1:{srv2.server_address[1]}"
    el2 = Elector(coord2, lease_dir, "standby", lease_s=lease).start()

    q = HttpWorkQueue(url1, lease_s=0.5, failover_urls=[url2])
    q.schedule("acme/failover")
    executions = []

    def handler(job) -> None:
        executions.append(job.repo_name)
        # primary dies shortly after the claim; the handler outlives
        # the whole election (expiry + grace + promotion)
        time.sleep(0.3)
        el1.stop()
        coord1.serving = False
        srv1.shutdown()
        srv1.server_close()
        time.sleep(6 * lease)

    try:
        done = q.work("w-failover", handler)
        assert done == ["acme/failover"]
        assert executions == ["acme/failover"]  # exactly once
        assert q.failures == []
        assert coord2.serving and el2.epoch >= 2  # standby took over
        assert q.base_url == url2  # worker auto-repointed
        assert coord2.jobs() == []  # released on the new primary
    finally:
        el2.stop()
        srv2.shutdown()
        srv2.server_close()
