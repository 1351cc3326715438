"""Interleaved A/B exculpation for the three contaminated BENCH_r03 rows.

BENCH_r03 was captured in a measured co-tenancy window (steal journal up
to 42.6%/5s sample) and three rows regressed vs BENCH_r02 without a
structural plan change to explain it:

    influx_decode                9.2 s -> 49.9 s
    dedup_ngram_jaccard_stopgram 3.3 s -> 13.3 s
    carbon_roundtrip             2.4 s ->  4.5 s

This tool applies the protocol the r3 verdict accepted for
dedup_minhash_lsh (tools/ab_minhash.py): a single warmed session, a fixed
input, old and new code interleaved A-B-A-B so host drift hits both
equally, medians reported.

* influx_decode / carbon_roundtrip — the r2 module versions (commit
  9d1b008) are hot-loaded from `git show` under aliased module names;
  both r2 files import nothing but pyspark and build pure JVM expression
  plans (no Python UDFs), so driver-side hot-loading is sound.  The r3
  changes under test: influx gained exact int64 ns->us conversion and
  last-wins tag dedup (influx.py:69,100-148); carbon gained last-wins
  tag dedup, a code-faithful tag regex, and a timestamp range guard
  (carbon.py:33-108).
* dedup_ngram_jaccard_stopgram — `git diff 9d1b008..HEAD` over
  ngram_jaccard_pairs/_stop_filtered/_grams_df is EMPTY (r3 only
  appended connected_components/canonical_docs to dedup.py), so there is
  no old-vs-new to race; the row is re-timed N times in the same session
  for a clean-window median.

Usage: python tools/ab_r3rows.py [sf_dir] [reps]
Output: per-rep lines + a JSON summary line for BENCH.md.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import dedup
from opentelemetry_collector_contrib_spark.session import get_spark
from opentelemetry_collector_contrib_spark.sources import carbon, influx

R2_COMMIT = "9d1b008"


def _load_r2(path: str, alias: str):
    """Materialize the r2 version of a package file and import it under
    an alias.  Only legal for modules whose r2 version imports nothing
    from this package (verified in the module docstring)."""
    src = subprocess.run(
        ["git", "show", f"{R2_COMMIT}:{path}"],
        check=True,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix=f"_{alias}.py", delete=False
    )
    tmp.write(src)
    tmp.close()
    spec = importlib.util.spec_from_file_location(alias, tmp.name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _influx_q(mod, ev):
    lines = ev.select(
        F.concat(
            F.col("event_type"),
            F.lit(",user=u"), (F.col("user_id") % 5).cast("string"),
            F.lit(" value="), F.col("value").cast("string"),
            F.lit(",k="), F.get_json_object("props", "$.k"), F.lit("i"),
            F.lit(" "),
            (F.unix_timestamp("ts").cast("long") * F.lit(1000000000)).cast(
                "string"
            ),
        ).alias("line")
    )
    parsed = mod.parse_influx_lines(lines).filter("valid")
    return parsed.groupBy(
        "measurement",
        F.col("tags").getItem("user").alias("user_tag"),
        "field_key",
    ).agg(
        F.round(F.sum("value"), 4).alias("value_sum"),
        F.count(F.lit(1)).alias("n_points"),
        F.max(F.col("ts").cast("long")).alias("max_epoch"),
    )


def _carbon_q(mod, ev):
    sel = ev.select(
        F.concat(F.lit("evt."), F.col("event_type")).alias("metric_name"),
        (F.col("user_id") % 10).cast("string").alias("user_tag"),
        F.col("value"),
        F.col("ts"),
    )
    lines = mod.to_carbon_lines(sel, "metric_name", ["user_tag"], "value", "ts")
    parsed = mod.parse_carbon_lines(lines).filter("valid")
    return parsed.groupBy(
        "metric_name", F.element_at("tags", "user_tag").alias("user_tag")
    ).agg(
        F.round(F.sum("value"), 4).alias("value_sum"),
        F.count(F.lit(1)).alias("n_lines"),
        F.max(F.col("ts").cast("long")).alias("max_epoch"),
    )


def _stopgram_q(docs):
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", 3, 0.5, max_doc_freq=4
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-r3rows", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    influx_r2 = _load_r2(
        "opentelemetry_collector_contrib_spark/sources/influx.py", "influx_r2"
    )
    carbon_r2 = _load_r2(
        "opentelemetry_collector_contrib_spark/sources/carbon.py", "carbon_r2"
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"events={ev.count()} docs={docs.count()}", flush=True)

    races = {
        "influx_decode": {
            "r2": lambda: _influx_q(influx_r2, ev),
            "now": lambda: _influx_q(influx, ev),
        },
        "carbon_roundtrip": {
            "r2": lambda: _carbon_q(carbon_r2, ev),
            "now": lambda: _carbon_q(carbon, ev),
        },
        "dedup_ngram_jaccard_stopgram": {
            # code identical since r2 (see module docstring): clean
            # re-timing only, labelled "now" twice for the same protocol
            "r2": lambda: _stopgram_q(docs),
            "now": lambda: _stopgram_q(docs),
        },
    }

    summary = {}
    for qname, variants in races.items():
        # warm both plans once, untimed
        for fn in variants.values():
            fn().count()
        times: dict[str, list[float]] = {k: [] for k in variants}
        counts: dict[str, int] = {}
        for rep in range(reps):
            for vname, fn in variants.items():
                t0 = time.time()
                counts[vname] = fn().count()
                dt = time.time() - t0
                times[vname].append(dt)
                print(f"{qname} rep{rep} {vname}: {dt:.2f}s "
                      f"({counts[vname]} rows)", flush=True)
        assert len(set(counts.values())) == 1, f"{qname}: variants disagree"
        med = {k: statistics.median(v) for k, v in times.items()}
        summary[qname] = {
            "rows": counts["now"],
            "median_r2_s": round(med["r2"], 2),
            "median_now_s": round(med["now"], 2),
            "ratio_now_vs_r2": round(med["now"] / med["r2"], 3),
            "runs_r2": [round(t, 2) for t in times["r2"]],
            "runs_now": [round(t, 2) for t in times["now"]],
        }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "cores": cores,
                      "results": summary}))


if __name__ == "__main__":
    main()
