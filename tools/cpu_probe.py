"""Pure-CPU hardware probe — the engine-free scaling ceiling.

Runs W pinned worker processes (taskset 0..W-1) spinning a float loop
for a fixed wall window and reports per-worker iterations/s plus the
N→4N efficiency between two worker counts.  No Spark, no memory
pressure: whatever this measures is the VIRTUALIZATION's CPU service
curve, the upper bound any compute job (including the pipeline) can
score on this host.  Used to normalize the Spark scaling pairs in
BENCH.md (a Spark efficiency of E against a hardware ceiling H is
E/H of the achievable ratio).

Usage: python tools/cpu_probe.py [lo] [hi] [seconds-per-level]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _spin(worker: int, seconds: float, out) -> None:
    os.sched_setaffinity(0, {worker})
    x = 1.0000001
    iters = 0
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        for _ in range(100_000):
            x = x * 1.0000001 % 10.0
        iters += 100_000
    out.put(iters / seconds)


def level(workers: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_spin, args=(w, seconds, q))
          for w in range(workers)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / len(rates)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    per_lo = level(lo, secs)
    per_hi = level(hi, secs)
    # per-worker rate ratio IS the hardware N->4N efficiency: total
    # throughput ratio / (hi/lo)
    print(json.dumps({
        "metric": "cpu_probe_efficiency",
        "workers": [lo, hi],
        "per_worker_iters_per_s": [round(per_lo), round(per_hi)],
        "hardware_efficiency": round(per_hi / per_lo, 3),
    }))


if __name__ == "__main__":
    main()
