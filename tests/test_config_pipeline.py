"""Config-driven pipeline builder + consistent-hash ring tests."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark import synth
from opentelemetry_collector_contrib_spark.operators import loadbalancing
from opentelemetry_collector_contrib_spark.plans import config as cfg


def test_build_pipeline_from_config(spark, sf_dir):
    """A config list reproduces the hand-built filter+router+enrich plan."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stages = [
        {"type": "filter", "expr": "value > 10.0"},
        {"type": "metadata", "set": {"k": "CAST(get_json_object(props, '$.k') AS LONG)"}},
        {"type": "router", "routes": [["alerts", "event_type = 'error'"],
                                      ["big", "value > 50.0"]], "default": "normal"},
        {"type": "restructure", "drop": ["props"]},
    ]
    out = cfg.build_pipeline(ev, stages)
    assert "props" not in out.columns and "route" in out.columns

    expected = (
        ev.filter("value > 10.0")
        .withColumn("k", F.expr("CAST(get_json_object(props, '$.k') AS LONG)"))
        .withColumn(
            "route",
            F.when(F.col("event_type") == "error", "alerts")
            .when(F.col("value") > 50.0, "big")
            .otherwise("normal"),
        )
        .drop("props")
    )
    assert out.exceptAll(expected).count() == 0
    assert expected.exceptAll(out).count() == 0


def test_build_pipeline_enrich_stage(spark, sf_dir):
    pages = synth.pages_from_documents(spark, sf_dir).limit(50)
    stages = [
        {"type": "metadata",
         "set": {"domain": "regexp_extract(url, '^https?://([^/]+)/', 1)"}},
        {"type": "enrich", "dim": synth.domain_info(spark), "on": "domain",
         "attrs": ["org", "tier"]},
        {"type": "attrs", "set": {"collector_name": "'otelcol-spark'"}},
    ]
    out = cfg.build_pipeline(pages, stages)
    rows = out.select("domain", "org", "tier", "collector_name").collect()
    assert all(r["collector_name"] == "otelcol-spark" for r in rows)
    assert any(r["org"] is not None for r in rows)


def test_ring_assign_matches_python_reference(spark):
    """Spark ring lookup == a plain-Python bisect over the same ring."""
    endpoints = ["a:1", "b:1", "c:1"]
    ring = loadbalancing.ring_positions(endpoints)
    keys = [str(i) for i in range(200)]

    def py_assign(key: str) -> str:
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % loadbalancing.RING_SPACE
        for pos, ep in ring:  # ring is sorted; first pos >= h
            if pos >= h:
                return ep
        return ring[0][1]

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["backend"]
        for r in df.select("k", loadbalancing.ring_assign("k", endpoints).alias("backend")).collect()
    }
    assert got == {k: py_assign(k) for k in keys}
    # all endpoints get some share (virtual nodes spread the space)
    assert len(set(got.values())) == len(endpoints)
