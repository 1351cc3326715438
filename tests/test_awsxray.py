"""awsxray segment translation vs exporter/awsxrayexporter/translator
(segment.go / cause.go / http.go semantics re-derived by hand)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, MapType, StringType, StructField, StructType,
)

from opentelemetry_collector_contrib_spark.sinks import awsxray

SCHEMA = StructType([
    StructField("trace_id", StringType()),
    StructField("span_id", StringType()),
    StructField("parent_span_id", StringType()),
    StructField("name", StringType()),
    StructField("kind", StringType()),
    StructField("status_code", StringType()),
    StructField("start_ts", DoubleType()),
    StructField("end_ts", DoubleType()),
    StructField("attrs", MapType(StringType(), StringType())),
    StructField("resource", MapType(StringType(), StringType())),
])

NOW = 0x60000000  # deterministic "now" for trace-id age validation


def _span(trace_epoch=NOW, span_id="00f067aa0ba902b7", parent="", name="GET /x",
          kind="SERVER", status="UNSET", attrs=None, resource=None):
    tid = f"{trace_epoch:08x}" + "a" * 24
    return (tid, span_id, parent, name, kind, status, 1.5, 2.5,
            attrs or {}, resource or {})


def _seg(spark, *rows):
    df = spark.createDataFrame(list(rows), SCHEMA)
    return awsxray.make_segments(df, NOW).collect()


def test_trace_id_format_and_age_gate(spark):
    fresh = _span()
    stale = _span(trace_epoch=NOW - 60 * 60 * 24 * 29)       # > 28 days
    future = _span(trace_epoch=NOW + 60 * 6)                  # > 5 min skew
    rows = _seg(spark, fresh, stale, future)
    assert len(rows) == 1
    assert rows[0].trace_id == f"1-{NOW:08x}-" + "a" * 24
    assert rows[0].id == "00f067aa0ba902b7"


def test_segment_name_ladder(spark):
    rows = _seg(
        spark,
        _span(attrs={"peer.service": "payments"}),
        _span(attrs={"aws.service": "DynamoDB"}, kind="CLIENT"),
        _span(attrs={"db.name": "orders",
                     "db.connection_string": "mysql://db.example.com:3306"},
              kind="CLIENT"),
        _span(resource={"service.name": "frontend"}),                 # SERVER
        _span(name="Признак!!<>", kind="INTERNAL", parent="x"),       # sanitized
        _span(name="<<>>", kind="INTERNAL", parent="x"),               # emptied
    )
    names = [r.name for r in rows]
    assert names[0] == "payments"
    assert names[1] == "DynamoDB" and rows[1].namespace == "aws"
    assert names[2] == "orders@db.example.com" and rows[2].namespace == "remote"
    assert names[3] == "frontend"
    assert names[4] == "Признак"      # \p{L} kept, punctuation stripped
    assert names[5] == "span"
    assert rows[4].type == "subsegment" and rows[3].type is None


def test_error_fault_throttle(spark):
    rows = _seg(
        spark,
        _span(status="ERROR", attrs={"http.status_code": "404", "http.method": "GET"}),
        _span(status="ERROR", attrs={"http.status_code": "429", "http.method": "GET"}),
        _span(status="ERROR", attrs={"http.status_code": "503", "http.method": "GET"}),
        _span(status="ERROR"),                                   # no http -> fault
        _span(status="OK", attrs={"http.status_code": "500", "http.method": "GET"}),
    )
    flags = [(r.error, r.fault, r.throttle) for r in rows]
    assert flags == [
        (True, False, False),
        (True, False, True),
        (False, True, False),
        (False, True, False),
        (False, False, False),
    ]


def test_http_url_assembly_and_origin(spark):
    rows = _seg(
        spark,
        _span(attrs={"http.method": "GET", "http.scheme": "https",
                     "http.host": "api.example.com", "http.host_port": "443",
                     "http.target": "/v1/users"},
              resource={"cloud.provider": "aws", "cloud.platform": "ECS",
                        "aws.ecs.launchtype": "fargate"}),
        _span(kind="CLIENT",
              attrs={"http.method": "POST", "net.peer.name": "backend",
                     "net.peer.ip": "10.0.0.9", "net.peer.port": "8080"},
              resource={"cloud.provider": "gcp", "cloud.platform": "EC2"}),
        _span(kind="CLIENT",
              attrs={"http.method": "POST", "net.peer.name": "backend"}),
        _span(resource={"container.name": "c1"}),
    )
    assert rows[0].http.request.url == "https://api.example.com/v1/users"
    assert rows[0].origin == "AWS::ECS::Fargate"
    assert rows[1].http.request.url == "http://backend:8080/"
    assert rows[1].origin is None                    # non-aws provider
    # net.peer.name alone does not arm URL assembly (http.go:89-90)
    assert rows[2].http.request.url is None
    assert rows[3].origin == "AWS::ECS::Container"   # presence fallback


def test_segment_docs_omit_nulls(spark):
    df = spark.createDataFrame([_span(attrs={"enduser.id": "u1"})], SCHEMA)
    docs = awsxray.to_segment_docs(awsxray.make_segments(df, NOW)).collect()
    doc = json.loads(docs[0].doc)
    assert doc["user"] == "u1" and doc["name"] == "GET /x"
    assert "parent_id" not in doc and "http" not in doc and "type" not in doc
    assert doc["start_time"] == 1.5 and doc["end_time"] == 2.5
