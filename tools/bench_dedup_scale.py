"""Measure exact n-gram Jaccard vs MinHash-LSH dedup wall time as the
corpus grows — the evidence that candidate-restricted LSH verification
actually beats the all-pairs join (VERDICT round 1, items 2/5).

Synthesizes n docs (deterministic): 5% are near-duplicates of a base doc
(one token changed), the rest unique. Times three variants at each n:
  exact        ngram_jaccard_pairs (unfiltered all-pairs gram join)
  stopgram     ngram_jaccard_pairs(max_doc_freq=...) — hot grams capped
  minhash_lsh  banded candidate gen + candidate-restricted verify

Usage: python tools/bench_dedup_scale.py [n ...]   (default 10000 50000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import dedup
from opentelemetry_collector_contrib_spark.session import get_spark


def synth_docs(spark, n: int):
    # Realistic dedup workload: tokens unique per (doc, position), so grams
    # are doc-local EXCEPT (a) every 20th doc copies the previous doc with
    # its last token changed (true near-dups, jaccard ~0.74) and (b) 10% of
    # docs (20%) open with the same 5-token boilerplate — the hot shingles that
    # make the unfiltered all-pairs gram join quadratic.
    base = "CASE WHEN id % 20 = 19 AND i < 19 THEN id - 1 ELSE id END"
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', CASE WHEN id % 5 = 0 "
            "THEN array('b0','b1','b2','b3','b4') ELSE array() END, "
            f"transform(sequence(0, 19), i -> concat('u', CAST({base} AS "
            "STRING), '_', CAST(i AS STRING))))"
        ).alias("text"),
    )


def timed(df) -> float:
    # best-of-N: this VM shows up to ~10x wall-clock drift between
    # identical runs (see BENCH.md), so the minimum is the defensible
    # steady-state number
    reps = int(os.environ.get("DEDUP_BENCH_REPS", "2"))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 50_000]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dedup-scale-bench", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        docs = synth_docs(spark, n).cache()
        docs.count()
        t_lsh = timed(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", 3, 16, 4, 0.5, max_doc_freq=50
            )
        )
        t_stop = timed(
            dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5, max_doc_freq=50)
        )
        max_exact = int(os.environ.get("DEDUP_BENCH_MAX_EXACT", "50000"))
        if n <= max_exact:
            t_exact = timed(dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5))
            exact_s = f"exact={t_exact:.1f}s speedup_lsh={t_exact / t_lsh:.1f}x"
        else:
            exact_s = f"exact=skipped(>{max_exact}, quadratic)"
        print(
            f"n={n}: stopgram={t_stop:.1f}s minhash_lsh={t_lsh:.1f}s {exact_s}",
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
