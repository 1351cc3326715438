"""awscloudwatchlogs exporter — cwLogBody omitempty / ordering semantics.

Oracle: exporter/awscloudwatchlogsexporter/exporter.go:150-191
(cwLogBody declaration order + per-type omitempty, ns→ms timestamp) and
exporter.go:193-203 (nil map for empty attrs).
"""

from __future__ import annotations

import json

from pyspark.sql.types import (
    IntegerType, LongType, MapType, StringType, StructField, StructType,
)

from opentelemetry_collector_contrib_spark.sinks import cloudwatchlogs

SCHEMA = StructType([
    StructField("ts_ns", LongType()),
    StructField("name", StringType()),
    StructField("body", StringType()),
    StructField("severity_number", IntegerType()),
    StructField("severity_text", StringType()),
    StructField("dropped_count", IntegerType()),
    StructField("flags", IntegerType()),
    StructField("trace_id", StringType()),
    StructField("span_id", StringType()),
    StructField("attributes", MapType(StringType(), StringType())),
    StructField("resource", MapType(StringType(), StringType())),
])

TID = "0102030405060708090a0b0c0d0e0f10"


def _row(**kw):
    base = dict(
        ts_ns=1_609_459_200_123_456_789, name="evt", body="hello",
        severity_number=9, severity_text="Info", dropped_count=0,
        flags=0, trace_id=TID, span_id="0102030405060708",
        attributes={"k": "v"}, resource={"service.name": "svc"},
    )
    base.update(kw)
    return base


def _one(spark, **kw):
    df = spark.createDataFrame([_row(**kw)], SCHEMA)
    return cloudwatchlogs.to_cw_log_events(df).collect()[0]


def test_timestamp_is_ns_div_ms(spark):
    # exporter.go:188 — integer division, sub-ms truncated
    out = _one(spark)
    assert out["timestamp"] == 1_609_459_200_123


def test_field_order_matches_go_struct(spark):
    out = _one(spark, dropped_count=3, flags=1)
    keys = list(json.loads(out["message"]).keys())
    assert keys == [
        "name", "body", "severity_number", "severity_text",
        "dropped_attributes_count", "flags", "trace_id", "span_id",
        "attributes", "resource",
    ]


def test_zero_numerics_and_empty_strings_drop(spark):
    # name ""/severity 0/text ""/dropped 0/flags 0 all omitempty
    out = _one(spark, name="", severity_number=0, severity_text="",
               dropped_count=0, flags=0)
    doc = json.loads(out["message"])
    for k in ("name", "severity_number", "severity_text",
              "dropped_attributes_count", "flags"):
        assert k not in doc


def test_empty_string_body_is_kept(spark):
    # body is interface{} — only nil drops (exporter.go:152 omitempty on
    # an interface checks IsNil, not emptiness)
    doc = json.loads(_one(spark, body="")["message"])
    assert doc["body"] == ""
    doc = json.loads(_one(spark, body=None)["message"])
    assert "body" not in doc


def test_all_zero_ids_drop(spark):
    # TraceID/SpanID.IsEmpty (exporter.go:174-179)
    doc = json.loads(_one(
        spark, trace_id="0" * 32, span_id="")["message"])
    assert "trace_id" not in doc and "span_id" not in doc
    doc = json.loads(_one(spark)["message"])
    assert doc["trace_id"] == TID


def test_empty_maps_drop_and_keys_sort(spark):
    doc = json.loads(_one(spark, attributes={}, resource=None)["message"])
    assert "attributes" not in doc and "resource" not in doc
    out = _one(spark, attributes={"zeta": "1", "alpha": "2"})
    msg = out["message"]
    assert msg.index('"alpha"') < msg.index('"zeta"')
