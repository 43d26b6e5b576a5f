"""Coordination-throughput smoke for the HTTP queue coordinator
(queue_http.py — round 8).

A 1000-executor fleet is bounded by import work, not coordination,
ONLY if the coordinator's claim/release rate comfortably exceeds the
fleet's job completion rate.  This smoke runs W worker PROCESSES
against one coordinator, each claiming+releasing as fast as it can,
and reports end-to-end jobs/sec plus exactly-once verification.

Usage: python tools/smoke_queue_throughput.py [n_jobs] [n_workers]
Prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

WORKER_SRC = """
import sys, json
sys.path.insert(0, "/root/repo")
from clickhub_spark.queue_http import HttpWorkQueue
q = HttpWorkQueue(sys.argv[1])
done = q.work(sys.argv[2], lambda job: None, max_polls=int(sys.argv[3]))
print(json.dumps(done))
"""


def main() -> None:
    from clickhub_spark.queue_http import HttpWorkQueue, make_coordinator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    srv, _ = make_coordinator(max_queue_length=n + 1, host="127.0.0.1")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    q = HttpWorkQueue(url)

    t0 = time.time()
    for i in range(n):
        q.schedule(f"org/repo{i:06d}", priority=i % 5)
    sched_sec = time.time() - t0

    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_SRC, url, f"w{i}", str(n)],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(w)
    ]
    processed: list[str] = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0
        processed.extend(json.loads(out.strip().splitlines()[-1]))
    drain_sec = time.time() - t0
    srv.shutdown()
    srv.server_close()

    assert len(processed) == n, f"{len(processed)} != {n}"
    assert len(set(processed)) == n, "double-processing"
    print(
        json.dumps(
            {
                "metric": "queue_throughput_smoke",
                "n_jobs": n,
                "n_workers": w,
                "schedule_sec": round(sched_sec, 2),
                "drain_sec": round(drain_sec, 2),
                "claims_per_sec": round(n / drain_sec, 1),
                "exactly_once": True,
            }
        )
    )


if __name__ == "__main__":
    main()
