"""Phase timing for the observe-path pipeline. Run under taskset.

Usage: taskset -c 0-7 python tools/profile_observe.py 8 [n_pages]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark import synth
from opentelemetry_collector_contrib_spark.plans import runner
from opentelemetry_collector_contrib_spark.session import get_spark
from opentelemetry_collector_contrib_spark.sinks import writer


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000
    spark = get_spark(f"obsprof{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix=f"obsprof{cores}_")
    try:
        t0 = time.perf_counter()
        synth.synth_pages(spark, n, parts=cores * 2).write.mode("overwrite").parquet(f"{work}/pages")
        synth_s = time.perf_counter() - t0
        pages = spark.read.parquet(f"{work}/pages")
        runner.build_tagged(spark, pages.limit(2000)).write.mode("overwrite").format("noop").save()

        for it in range(2):
            tagged = runner.build_tagged(spark, pages)
            cfg = runner.routing_config()
            routes = [nm for nm, _ in cfg.predicate_routes] + list(cfg.table.values()) + [cfg.default_sink]
            obs = Observation(f"rc{it}")
            observed = tagged.drop("text").observe(
                obs, *[F.sum(F.when(F.col("route") == r, 1).otherwise(0)).alias(r) for r in routes]
            )
            t0 = time.perf_counter()
            writer.write_fanout(observed, f"{work}/o{it}/sinks")
            w = time.perf_counter() - t0

            t0 = time.perf_counter()
            sink_rows = spark.read.parquet(f"{work}/o{it}/sinks")
            sm, wm = runner._agg_pair(sink_rows)
            sm.write.mode("overwrite").parquet(f"{work}/o{it}/sm")
            wm.write.mode("overwrite").parquet(f"{work}/o{it}/wm")
            a = time.perf_counter() - t0
            print({"cores": cores, "iter": it, "synth": round(synth_s, 1),
                   "fanout_write(parse+observe)": round(w, 1), "aggs": round(a, 1),
                   "docs_per_sec": round(n / (w + a))}, flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
