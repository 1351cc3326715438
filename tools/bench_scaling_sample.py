"""Many-short-samples variant of the scaling benchmark.

On a host whose effective speed drifts several-fold within minutes
(co-tenant interference invisible to the guest), adjacent-pair ratios are
dominated by the drift, not the engine (observed pairs from the long
protocol: 0.31, 0.68, 1.52 — see BENCH.md). This variant instead:

  - alternates MANY short runs per level (lo, hi, lo, hi, ...), sampling
    more host windows per wall-clock minute;
  - reports BEST-OF-LEVEL: interference only ever *slows* a run
    (one-sided noise), so the max over samples is a consistent estimator
    of the true capability at each level, and the ratio of maxima is the
    defensible efficiency number;
  - also reports the full sample journal so the variance is visible.

Usage: python tools/bench_scaling_sample.py [n_pages] [samples_per_level]
Env: SCALING_LO / SCALING_HI core counts (default 8 / 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, n_pages: int) -> float | None:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_PAGES=str(n_pages),
        SPARK_GRAFT_BENCH_QUERIES="0",
        TMPDIR="/dev/shm",
        SPARK_LOCAL_DIRS="/dev/shm",
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    if out.returncode != 0:
        print(f"# run cores={cores} failed: {out.stderr[-500:]}", file=sys.stderr)
        return None
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return float(json.loads(line)["value"])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    lo = int(os.environ.get("SCALING_LO", "8"))
    hi = int(os.environ.get("SCALING_HI", "32"))
    lo_vals: list[float] = []
    hi_vals: list[float] = []
    for i in range(samples):
        v = run_once(lo, n_pages)
        if v:
            lo_vals.append(v)
            print(f"# sample {i} lo[{lo}] = {v:.0f}", file=sys.stderr, flush=True)
        v = run_once(hi, n_pages)
        if v:
            hi_vals.append(v)
            print(f"# sample {i} hi[{hi}] = {v:.0f}", file=sys.stderr, flush=True)
    if not lo_vals or not hi_vals:
        sys.exit("no successful samples")
    best_lo, best_hi = max(lo_vals), max(hi_vals)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_best_of_level",
                "n_pages": n_pages,
                "cores": [lo, hi],
                "lo_samples": [round(v, 1) for v in lo_vals],
                "hi_samples": [round(v, 1) for v in hi_vals],
                f"best_docs_per_sec_local[{lo}]": best_lo,
                f"best_docs_per_sec_local[{hi}]": best_hi,
                "efficiency_best_of_level": round(
                    (best_hi / best_lo) / (hi / lo), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
