"""Unit tests for document-shaped sinks (EMF log events)."""

from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.sinks import awsemf


def test_emf_log_event_shape(spark):
    df = spark.createDataFrame(
        [("api", "eu", 3.0, 12.5, 1700000000123)],
        "svc string, region string, calls double, lat_sum double, ts_ms long",
    )
    out = awsemf.to_emf_log_events(
        df,
        "ns/test",
        ["svc", "region"],
        ["calls", "lat_sum"],
        "ts_ms",
        units={"calls": "Count"},
        rollup="ZeroAndSingleDimensionRollup",
    ).collect()[0]
    assert out["ts_ms"] == 1700000000123
    doc = json.loads(out["message"])
    # labels + metric values are top-level fields (metric_translator.go:353-377)
    assert doc["svc"] == "api" and doc["region"] == "eu"
    assert doc["calls"] == 3.0 and doc["lat_sum"] == 12.5
    aws = doc["_aws"]
    assert aws["Timestamp"] == 1700000000123
    (cw,) = aws["CloudWatchMetrics"]
    assert cw["Namespace"] == "ns/test"
    # full set first, then zero rollup, then sorted singles (util.go:117-150)
    assert cw["Dimensions"] == [["region", "svc"], [], ["region"], ["svc"]]
    assert cw["Metrics"][0] == {"Name": "calls", "Unit": "Count"}
    # omitted Unit is truly absent, not null (Go omit-empty)
    assert cw["Metrics"][1] == {"Name": "lat_sum"}


def test_emf_no_rollup(spark):
    df = spark.createDataFrame([("a", 1.0, 5)], "k string, v double, ts_ms long")
    doc = json.loads(
        awsemf.to_emf_log_events(df, "n", ["k"], ["v"], "ts_ms").collect()[0][
            "message"
        ]
    )
    assert doc["_aws"]["CloudWatchMetrics"][0]["Dimensions"] == [["k"]]


def test_sumologic_carbon2_and_graphite(spark):
    from opentelemetry_collector_contrib_spark.sinks import sumologic

    df = spark.createDataFrame(
        [("h 1", "a=b", "req count", 7, 1700000000, "x.y", "ms")],
        "host string, name string, metric_name string, value long,"
        " ts_sec long, dc string, unit string",
    )
    (c2,) = sumologic.to_carbon2_lines(
        df, ["host", "name"], "metric_name", "value", "ts_sec", unit_col="unit"
    ).collect()
    # space sanitized in values, '=' becomes ':', 'name' key prefixed,
    # metric name sanitized, TWO spaces before value
    assert c2["line"] == "host=h_1 _name=a:b metric=req_count unit=ms  7 1700000000"
    (gr,) = sumologic.to_graphite_lines(
        df, ["metric_name", "dc", "host"], "value", "ts_sec"
    ).collect()
    # graphite escapes '.' and ' ' to '_' in each field
    assert gr["line"] == "req_count.x_y.h_1 7 1700000000"
