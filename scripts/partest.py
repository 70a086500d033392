#!/usr/bin/env python
"""Parallel test runner: the full pytest suite in < 10 minutes on one box.

The suite (420+ tests, each module sharing one session-scoped Spark
fixture) runs ~17 min serially — past any reviewer's patience and past
most CI command budgets. pytest-xdist is the stock answer but isn't in
this container, so this runner implements the same idea with stdlib
only: a pool of N worker processes pulls test FILES from a shared queue
and runs each as its own ``pytest <file>`` subprocess. Dynamic pulling
self-balances without needing per-file duration knowledge (the
longest-processing-time schedule emerges on its own: big files simply
hold their worker longer).

Resource discipline — the part a naive parallel pytest gets wrong:
every worker would otherwise build the default engine session
(local[32], 48g driver), oversubscribing 32 cores N times and asking
for N x 48g of heap. The runner sets SPARK_GRAFT_CPUS and
SPARK_GRAFT_DRIVER_MEM per worker so the whole pool fits the box
(cores/N threads and a bounded heap each); ``tests/conftest.py`` builds
its session through ``get_spark``, which reads both.

Usage:
    python scripts/partest.py            # auto workers (default 8)
    python scripts/partest.py -n 6      # explicit pool size
    python scripts/partest.py -k bpe    # forwarded to pytest

Exit code 0 iff every file's pytest exits 0 (or 5 = no tests collected,
e.g. under -k). Per-file tails are printed for failures.
"""

from __future__ import annotations

import argparse
import os
import queue
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=8)
    ap.add_argument("-k", dest="keyword", default=None)
    ap.add_argument("files", nargs="*", help="test files (default: tests/test_*.py)")
    args = ap.parse_args()

    files = args.files or sorted(
        str(p.relative_to(REPO)) for p in (REPO / "tests").glob("test_*.py")
    )
    n = max(1, min(args.workers, len(files)))
    cpus = max(2, (os.cpu_count() or 8) // n)

    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    # partest is the FULL-suite runner: include the files the default
    # serial run skips as slow (r14, VERDICT r13 #2 — see conftest)
    env["SPARK_GRAFT_RUN_SLOW"] = "1"
    # one derby/warehouse dir per worker pid is not needed: each pytest
    # process runs in its own JVM and CWD; spark.ui is disabled in
    # get_spark so there are no port collisions either.

    q: queue.Queue[str] = queue.Queue()
    for f in files:
        q.put(f)
    results: dict[str, tuple[int, float, str]] = {}
    lock = threading.Lock()

    def worker() -> None:
        while True:
            try:
                f = q.get_nowait()
            except queue.Empty:
                return
            cmd = [sys.executable, "-m", "pytest", f, "-q", "--no-header"]
            if args.keyword:
                cmd += ["-k", args.keyword]
            t0 = time.time()
            proc = subprocess.run(
                cmd, cwd=REPO, env=env, capture_output=True, text=True
            )
            dt = time.time() - t0
            tail = (proc.stdout or "").strip().splitlines()[-1:] or [""]
            with lock:
                results[f] = (proc.returncode, dt, tail[0])
                status = "ok" if proc.returncode in (0, 5) else "FAIL"
                print(f"[{status}] {f:45s} {dt:6.1f}s  {tail[0]}", flush=True)
            if proc.returncode not in (0, 5):
                with lock:
                    print(proc.stdout[-3000:], file=sys.stderr, flush=True)

    t0 = time.time()
    threads = [threading.Thread(target=worker) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    bad = {f: r for f, r in results.items() if r[0] not in (0, 5)}
    print(
        f"\n{len(files)} files, {n} workers x local[{cpus}], "
        f"wall {wall:.0f}s, failures: {len(bad)}"
    )
    for f in sorted(bad):
        print(f"  FAILED {f} (rc={bad[f][0]})")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
