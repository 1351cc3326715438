"""Per-phase scaling profile: run each pipeline phase at a given core count.

Usage: python tools/profile_phases.py <cores> [n_pages]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark import synth
from opentelemetry_collector_contrib_spark.operators import spanmetrics, statsd
from opentelemetry_collector_contrib_spark.plans import metrics as mm
from opentelemetry_collector_contrib_spark.plans import runner
from opentelemetry_collector_contrib_spark.session import get_spark
from opentelemetry_collector_contrib_spark.sinks import writer


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    spark = get_spark(f"phase-prof-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix=f"phases{cores}_")
    phases: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        synth.synth_pages(spark, n, parts=cores * 2).write.mode("overwrite").parquet(f"{work}/pages")
        phases["synth_untimed"] = time.perf_counter() - t0
        pages = spark.read.parquet(f"{work}/pages")
        runner.build_tagged(spark, pages.limit(2000)).write.mode("overwrite").format("noop").save()

        t0 = time.perf_counter()
        tagged = runner.build_tagged(spark, pages).persist(StorageLevel.MEMORY_AND_DISK)
        counts = {r["route"]: r["rows"] for r in mm.routed_counts(tagged).collect()}
        phases["parse_persist_counts"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        writer.write_fanout(
            tagged.drop("text"), f"{work}/sinks",
            files_per_partition=max(1, cores // 4),
        )
        phases["fanout_write"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        sm = spanmetrics.span_metrics(
            tagged.filter(F.col("parse_ok")), dims=["route", "domain", "severity_text"],
            latency_col="latency_ms", dim_defaults={"severity_text": "Undefined"},
        )
        sm.write.mode("overwrite").parquet(f"{work}/sm")
        wm = statsd.statsd_aggregate(
            tagged.filter(F.col("parse_ok")), ts_col="warc_ts", name_col="lang",
            value_col="latency_ms", interval="1 hour", order_col="page_id",
        )
        wm.write.mode("overwrite").parquet(f"{work}/wm")
        phases["aggregates"] = time.perf_counter() - t0
        tagged.unpersist()
        total = sum(v for k, v in phases.items() if k != "synth_untimed")
        print({"cores": cores, "n": n,
               **{k: round(v, 1) for k, v in phases.items()},
               "timed_total": round(total, 1),
               "docs_per_sec": round(n / total)})
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
