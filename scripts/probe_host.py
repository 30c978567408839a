#!/usr/bin/env python
"""Spark-free effective-parallelism probe (SCALE.md "closing-bench
calibration" method, promoted to a script per the round-8 verdict).

local[N] timings scale directly with the host's EFFECTIVE core count,
which co-tenant load can push far below the advertised CPU count with
no cgroup limit visible from inside the VM (r8 measured ~4 effective
cores on a host reporting 32 — a +52% uniform "regression" on untouched
plans). This probe takes ~2 s and makes every bench record
self-calibrating: a single-core md5 loop is timed alone, then one copy
per CPU concurrently; with perfect scaling the concurrent wall-clock
equals the single-core time, so

    effective_cores = workers * t_single / t_concurrent.

bench.py runs it automatically and stamps the result into
BENCH_DETAIL.json (and the headline line), so a throttled measurement
carries its own evidence instead of needing an after-the-fact re-run.

Usage: python scripts/probe_host.py  →  one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import time

_ITERS = 200_000


def _md5_loop(iters: int = _ITERS) -> None:
    h = b"x" * 64
    for _ in range(iters):
        h = hashlib.md5(h).digest()


def probe(workers: int | None = None) -> dict:
    """Run the calibration; returns timings plus the derived effective
    core count. Fork-based workers so interpreter startup isn't timed;
    processes (not threads) so the GIL isn't the ceiling."""
    workers = workers or os.cpu_count() or 1
    _md5_loop(_ITERS // 10)  # warm the allocator / branch caches
    t_single = float("inf")
    for _ in range(2):  # min-of-2: the single leg anchors the ratio
        t0 = time.perf_counter()
        _md5_loop()
        t_single = min(t_single, time.perf_counter() - t0)

    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=_md5_loop) for _ in range(workers)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    t_conc = time.perf_counter() - t0
    eff = workers * t_single / t_conc if t_conc > 0 else float(workers)
    return {
        "workers": workers,
        "t_single_sec": round(t_single, 3),
        "t_concurrent_sec": round(t_conc, 3),
        "effective_cores": round(min(eff, float(workers)), 1),
        # healthy = concurrent efficiency >= 60% of advertised cores;
        # below that, bench numbers are host-dominated (r6/r8 episodes
        # sat at 12-38%)
        "healthy": bool(eff >= 0.6 * workers),
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
