"""Embedding near-dup scale bench: exact vs anchor-banded vs blocked-GEMM.

Generates a deterministic clustered corpus (the realistic near-dup case:
64 spherical clusters in 64-dim with bounded radius, 1% planted twin
documents at cosine ~0.95) at several sizes, then times the three
result-identical paths from operators/similarity.py at threshold 0.9 and
reports the anchor-prune rate (similarity.LAST_PRUNE_STATS) alongside the
wall-clocks.  Identity is asserted wherever two paths both ran.

Why a separate corpus from /root/testdata: the sf tables' embeddings are
near-uniform on the sphere — the adversarial case where NO exact method
can prune (the contract queries still run there and the prune-rate log
reports 100% admitted, honestly).  Pruning claims need clustered data,
which is what real embedding corpora look like.

Anchor count is the production default (``n_anchors=None`` →
:func:`similarity.auto_n_anchors`, ~sqrt(N)/4): the row-4 evidence that
the prune keeps biting as N grows WITHOUT a caller-side knob.

Usage: python tools/bench_neardup.py [N ...]   (default 10000 20000 50000 200000)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

THRESHOLD = 0.9
N_CLUSTERS = 64
DIM = 64
SEED = 0
OUT_DIR = "/tmp/neardup_bench"
# exact all-pairs JVM fold is ~7 us/pair/core: cap it where it stays < ~3 min
EXACT_MAX_N = 20000
# JVM-fold verify is ~7 us/candidate-core; past 10k the fold dominates
BANDED_MAX_N = 10000


def gen_corpus(n: int) -> str:
    """Clustered unit vectors + 1% twins, written once per size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{OUT_DIR}/corpus_{n}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sigma = math.sqrt(0.2 / DIM)
    cell = rng.integers(0, N_CLUSTERS, n)
    g = rng.standard_normal((n, DIM))
    gn = np.linalg.norm(g, axis=1, keepdims=True)
    # bounded cluster radius: clip noise norm^2 into [58, 80] so cluster
    # radii stay ~<33 deg (organic within-cluster cosines ~0.75-0.87,
    # below threshold) while cross-center angles are ~90 deg
    g = g / gn * np.clip(gn, math.sqrt(58.0), math.sqrt(80.0))
    v = centers[cell] + sigma * g
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    n_dup = n // 100
    src = rng.choice(n, n_dup, replace=False)
    tw = v[src] + math.sqrt(0.06 / DIM) * rng.standard_normal((n_dup, DIM))
    tw /= np.linalg.norm(tw, axis=1, keepdims=True)
    u = np.vstack([v, tw]).astype(np.float32)
    ids = np.arange(len(u), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(u.ravel()), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, path)
    return path


def main() -> None:
    from opentelemetry_collector_contrib_spark.operators import similarity
    from opentelemetry_collector_contrib_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [10000, 20000, 50000, 200000]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-neardup", cores=cores, shuffle_partitions=cores)
    rows = []
    for n in sizes:
        path = gen_corpus(n)
        emb = spark.read.parquet(path)
        total = emb.count()  # warm the scan (= n + 1% twins)
        mod = max(1, total // 10000)
        kw = dict(
            threshold=THRESHOLD, n_anchors=None, iters=2,
            train_sample_mod=mod,
        )
        res: dict[str, object] = {"n": total}

        t0 = time.time()
        blocked = {
            tuple(r)
            for r in similarity.neardup_pairs_blocked(emb, **kw).collect()
        }
        res["blocked_s"] = round(time.time() - t0, 1)
        res["pairs"] = len(blocked)
        st = dict(similarity.LAST_PRUNE_STATS)
        res["n_anchors"] = st["n_anchors"]
        res["cell_pairs_admitted"] = (
            f"{st['allowed_cell_pairs']}/{st['total_cell_pairs']}"
        )
        res["candidate_frac"] = round(
            st["est_candidate_ordered_pairs"] / max(1, st["corpus_ordered_pairs"]), 4
        )

        if n <= BANDED_MAX_N:
            t0 = time.time()
            banded = {
                tuple(r)
                for r in similarity.neardup_pairs_banded(
                    emb, salt=cores, **kw
                ).collect()
            }
            res["banded_s"] = round(time.time() - t0, 1)
            assert banded == blocked, "banded != blocked"
        else:
            res["banded_s"] = None

        if n <= EXACT_MAX_N:
            t0 = time.time()
            # repartition so the cross join isn't serialized on one input
            # partition — fairest exact baseline
            exact = {
                tuple(r)
                for r in similarity.neardup_pairs(
                    emb.repartition(cores), threshold=THRESHOLD
                ).collect()
            }
            res["exact_s"] = round(time.time() - t0, 1)
            assert exact == blocked, "exact != blocked"
            res["identical"] = True
        else:
            res["exact_s"] = None
            res["identical"] = "vs banded" if res["banded_s"] else "(prune proof)"

        rows.append(res)
        print(json.dumps(res), flush=True)

    print("\n| N | anchors (auto) | pairs | cell-pairs admitted | candidate frac | exact s | banded s | blocked s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n']} | {r['n_anchors']} | {r['pairs']} | {r['cell_pairs_admitted']} "
            f"| {r['candidate_frac']} | {r['exact_s'] or '—'} "
            f"| {r['banded_s'] or '—'} | {r['blocked_s']} |"
        )


if __name__ == "__main__":
    main()
