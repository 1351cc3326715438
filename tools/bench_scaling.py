"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 N->4N).

No real cluster exists in this sandbox, so the criterion is evidenced the
way BASELINE.md documents: the identical end-to-end pipeline job at two
local parallelism levels (local[8] vs local[32]) over the same input size,
reporting docs/sec at both plus scaling efficiency
(throughput_4N / throughput_N) / 4.

Each level runs in its own subprocess (own JVM/SparkSession). Results are
appended to BENCH.md.

Usage: python tools/bench_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


TRIALS = int(os.environ.get("SCALING_TRIALS", "3"))
# levels are INTERLEAVED (lo,hi,lo,hi,...) because this VM's effective
# CPU/disk speed drifts up to ~10x over tens of minutes — adjacent-in-time
# samples are the only fair comparison. Efficiency is therefore computed
# PER ADJACENT PAIR (lo_i, hi_i) and summarized as median-of-pairs (the
# defensible central estimate) alongside best-of-level (steady state).


def run_once(cores: int, n_pages: int) -> dict | None:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_PAGES=str(n_pages),
        SPARK_GRAFT_BENCH_QUERIES="0",
        # bench working set (input parquet, sinks, shuffle) on tmpfs: the
        # engine is what's being measured, not this VM's ~250 MB/s virtio
        # disk; a real cluster's NVMe/object-store bandwidth scales with
        # nodes, a single shared virtual disk does not
        TMPDIR="/dev/shm",
        SPARK_LOCAL_DIRS="/dev/shm",
    )
    # taskset pins the WHOLE process tree (JVM + GC threads + python
    # workers) to exactly `cores` CPUs — without it the local[8] run leaks
    # GC/IO/python work onto the other 24 cores and fakes a high baseline,
    # which is not how an 8-core cluster node behaves
    cpu_list = f"0-{cores - 1}"
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    if out.returncode != 0:
        print(f"# trial cores={cores} failed:\n{out.stderr[-2000:]}", file=sys.stderr)
        return None
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    import statistics

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    # levels configurable: the north_rule asks N vs 4N; on this shared host
    # 32-wide windows are co-tenancy lottery (see BENCH.md), so 4->16 is a
    # legitimate N->4N pair with far more stable windows
    lo = int(os.environ.get("SCALING_LO", "8"))
    hi = int(os.environ.get("SCALING_HI", "32"))
    pairs: list[tuple[float, float]] = []
    steals: list[tuple[float, float]] = []
    for t in range(TRIALS):
        r_lo = run_once(lo, n_pages)
        r_hi = run_once(hi, n_pages)
        if r_lo and r_hi:
            pairs.append((r_lo["value"], r_hi["value"]))
            # bench.py brackets each timed region with /proc/stat reads;
            # carrying the e2e rows' steal%% makes every pair
            # self-attributing (VERDICT r4 item 3/10)
            steals.append((
                r_lo.get("steal_pct", {}).get("pipeline_e2e", -1.0),
                r_hi.get("steal_pct", {}).get("pipeline_e2e", -1.0),
            ))
            eff = (r_hi["value"] / r_lo["value"]) / (hi / lo)
            print(
                f"# pair {t}: lo={r_lo['value']} hi={r_hi['value']} "
                f"eff={eff:.3f} steal_lo={steals[-1][0]}% "
                f"steal_hi={steals[-1][1]}%",
                file=sys.stderr,
            )
    if not pairs:
        sys.exit("no successful trial pairs")
    per_pair = [(h / l) / (hi / lo) for l, h in pairs]
    best_lo = max(l for l, _ in pairs)
    best_hi = max(h for _, h in pairs)
    best_eff = (best_hi / best_lo) / (hi / lo)
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "n_pages": n_pages,
        "trial_pairs": len(pairs),
        "pairs": [[round(l, 1), round(h, 1)] for l, h in pairs],
        "pair_steal_pct": [[sl, sh] for sl, sh in steals],
        f"docs_per_sec_local[{lo}]": best_lo,
        f"docs_per_sec_local[{hi}]": best_hi,
        "per_pair_efficiency": [round(e, 3) for e in per_pair],
        "median_efficiency": round(statistics.median(per_pair), 3),
        "best_of_level_efficiency": round(best_eff, 3),
        "pass_median": statistics.median(per_pair) >= 0.8,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
