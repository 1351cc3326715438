"""Interleaved A/B: r1 vs r2 minhash_lsh_pairs plan at fixed input.

BENCH_r02 showed dedup_minhash_lsh at 19.96 s vs 9.36 s in r1 while every
other query got faster.  The r2 code change replaced the verify stage:
r1 joined candidates against the FULL all-pairs ngram Jaccard truth
(quadratic at scale — the r1 verdict's main dedup criticism), r2 verifies
with exact Jaccard restricted to the candidate pairs
(dedup.jaccard_for_pairs — linear in candidates x grams/doc).  The bench
query passes max_doc_freq=None, so the added stop-gram window pass never
executes there and CANNOT explain the delta.

This tool times both verify plans interleaved (A B A B ...) on the same
warmed session and input so VM drift hits both equally, and prints
medians.  Result goes to BENCH.md.

Usage: python tools/ab_minhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import dedup
from opentelemetry_collector_contrib_spark.session import get_spark


def _candidates(docs: DataFrame) -> DataFrame:
    """The shared shingle->minhash->band->bucket candidate stage (identical
    in r1 and r2)."""
    grams = dedup._grams_df(docs, "doc_id", "text", 3)
    num_hashes, bands = 8, 4
    rows = num_hashes // bands
    sig = grams.groupBy("doc").agg(
        *[
            F.min(dedup.md5_int(F.col("gram"), salt=f"{s}:")).alias(f"mh_{s}")
            for s in range(num_hashes)
        ]
    )
    stack_args = []
    for b in range(bands):
        key = ", ':', ".join(
            f"CAST(mh_{b * rows + r} AS STRING)" for r in range(rows)
        )
        stack_args.append(f"{b}, md5(CAST(concat({key}) AS BINARY))")
    banded = sig.selectExpr(
        "doc", f"stack({bands}, {', '.join(stack_args)}) AS (band, bucket)"
    )
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )


def r1_plan(docs: DataFrame) -> DataFrame:
    """round-1 shape: candidates joined against the FULL all-pairs truth."""
    cand = _candidates(docs)
    true_pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5)
    return cand.join(true_pairs, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard"
    )


def r2_plan(docs: DataFrame) -> DataFrame:
    """current shape: candidate-restricted verify."""
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=4, threshold=0.5
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-minhash", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"docs={docs.count()}")

    times: dict[str, list[float]] = {"r1": [], "r2": []}
    counts: dict[str, int] = {}
    for rep in range(reps):
        for name, fn in (("r1", r1_plan), ("r2", r2_plan)):
            t0 = time.time()
            counts[name] = fn(docs).count()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f}s ({counts[name]} pairs)", flush=True)
    assert counts["r1"] == counts["r2"], "plans disagree"
    for name in ("r1", "r2"):
        print(
            f"{name}: median {statistics.median(times[name]):.2f}s "
            f"runs {[round(t, 2) for t in times[name]]}"
        )


if __name__ == "__main__":
    main()
