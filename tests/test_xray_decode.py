"""X-Ray receiver decode (sources/awsxray.py) vs the reference translator
semantics (receiver/awsxrayreceiver/internal/translator/translator_test.go
drives the same cases) + the exporter round-trip oracle."""

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources import awsxray as xrx
from opentelemetry_collector_contrib_spark.sinks import awsxray as xtx


def _decode(spark, *docs, max_depth=8):
    df = spark.createDataFrame([(d,) for d in docs], "doc STRING")
    return xrx.segments_to_spans(df, max_depth=max_depth).collect()


TRACE = "1-5f84c7a1-e7d1852db8c4fd35d88bf49a"
TID = "5f84c7a1e7d1852db8c4fd35d88bf49a"


def test_server_segment_with_nested_subsegments(spark):
    """3-level nesting: root (no parent) is SERVER; namespace 'aws'
    subsegment is CLIENT with aws.service = name; namespace-less leaf is
    INTERNAL; all inherit the root trace id and chain parents."""
    doc = json.dumps({
        "name": "api", "id": "aaaaaaaaaaaaaaaa", "trace_id": TRACE,
        "start_time": 100.0, "end_time": 101.5,
        "http": {"request": {"method": "GET", "client_ip": "1.2.3.4"},
                 "response": {"status": 200}},
        "aws": {"xray": {"sdk": "X-Ray for Go", "sdk_version": "1.7"}},
        "subsegments": [{
            "name": "DynamoDB", "id": "bbbbbbbbbbbbbbbb",
            "start_time": 100.1, "end_time": 100.9, "namespace": "aws",
            "aws": {"operation": "GetItem", "table_name": "t1",
                    "region": "us-east-1", "retries": 1},
            "subsegments": [{
                "name": "conn", "id": "cccccccccccccccc",
                "start_time": 100.2,
            }],
        }],
    })
    rows = {r["span_id"]: r for r in _decode(spark, doc)}
    assert set(rows) == {"aaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbb",
                         "cccccccccccccccc"}
    root = rows["aaaaaaaaaaaaaaaa"]
    assert root["trace_id"] == TID and root["valid"]
    assert root["kind"] == "SERVER" and root["parent_span_id"] is None
    assert root["status_code"] == "UNSET"  # 200 -> unset
    assert root["attrs"]["http.client_ip"] == "1.2.3.4"
    assert root["resource"]["cloud.provider"] == "aws"
    assert root["resource"]["telemetry.sdk.language"] == "Go"
    assert root["resource"]["telemetry.sdk.name"] == "X-Ray for Go"
    mid = rows["bbbbbbbbbbbbbbbb"]
    assert mid["trace_id"] == TID  # inherited
    assert mid["parent_span_id"] == "aaaaaaaaaaaaaaaa"
    assert mid["kind"] == "CLIENT"
    assert mid["attrs"]["aws.service"] == "DynamoDB"
    assert mid["attrs"]["aws.operation"] == "GetItem"
    assert mid["attrs"]["aws.table_name"] == "t1"
    assert mid["attrs"]["aws.xray.retries"] == "1"
    # subsegments share the root's resource (populateResource once per doc)
    assert mid["resource"]["cloud.provider"] == "aws"
    leaf = rows["cccccccccccccccc"]
    assert leaf["parent_span_id"] == "bbbbbbbbbbbbbbbb"
    assert leaf["kind"] == "INTERNAL"
    assert leaf["end_ts"] is None  # in-progress, no end_time


def test_cause_object_exception_events_and_status(spark):
    """cause.go: exception objects -> exception events with the rendered
    stacktrace; cause forces status ERROR even without an http status;
    exceptions imply telemetry.sdk.language java (sdk.go)."""
    doc = json.dumps({
        "name": "svc", "id": "aaaaaaaaaaaaaaaa", "trace_id": TRACE,
        "start_time": 1.0,
        "aws": {"xray": {"sdk": "X-Ray for Java"}},
        "cause": {
            "working_directory": "/srv",
            "exceptions": [{
                "id": "abcdefabcdefabcd", "message": "boom",
                "type": "TooManyRequests", "remote": True,
                "stack": [
                    {"path": "Svc.java", "line": 10, "label": "Svc.run"},
                    {"path": "Main.java", "line": 2, "label": "Main.main"},
                ],
            }],
        },
    })
    row = _decode(spark, doc)[0]
    assert row["status_code"] == "ERROR"
    assert row["status_message"] is None  # object cause, not a bare id
    assert row["resource"]["telemetry.sdk.language"] == "java"
    evt = row["events"][0]
    assert evt["name"] == "exception"
    a = evt["attrs"]
    assert a["aws.xray.exception.id"] == "abcdefabcdefabcd"
    assert a["exception.message"] == "boom"
    assert a["aws.xray.exception.remote"] == "true"
    assert a["exception.stacktrace"] == (
        "TooManyRequests: boom\n"
        "\tat Svc.run(Svc.java: 10)\n"
        "\tat Main.main(Main.java: 2)\n"
    )


def test_bare_cause_id_annotations_metadata_and_invalids(spark):
    """A bare-string cause becomes the status message; annotations keep
    their keys, metadata lands JSON-stringified under the prefix; a short
    trace id or a bad namespace flags the row invalid."""
    good = json.dumps({
        "name": "s", "id": "aaaaaaaaaaaaaaaa", "trace_id": TRACE,
        "start_time": 1.0, "cause": "0123456789abcdef",
        "annotations": {"tier": "gold", "n": 7, "ok": True},
        "metadata": {"m": {"a": 1}},
    })
    bad_trace = json.dumps({
        "name": "s", "id": "bbbbbbbbbbbbbbbb", "trace_id": "1-dead",
        "start_time": 1.0,
    })
    bad_ns = json.dumps({
        "name": "s", "id": "cccccccccccccccc", "trace_id": TRACE,
        "parent_id": "aaaaaaaaaaaaaaaa", "start_time": 1.0,
        "namespace": "gcp",
    })
    rows = {r["span_id"]: r for r in _decode(spark, good, bad_trace, bad_ns)}
    g = rows["aaaaaaaaaaaaaaaa"]
    assert g["status_code"] == "ERROR"
    assert g["status_message"] == "0123456789abcdef"
    assert g["attrs"]["tier"] == "gold"
    assert g["attrs"]["n"] == "7"
    assert g["attrs"]["ok"] == "true"
    assert g["attrs"]["aws.xray.metadata.m"] == '{"a":1}'
    assert not rows["bbbbbbbbbbbbbbbb"]["valid"]
    assert not rows["cccccccccccccccc"]["valid"]
    # unexpected namespace still decodes the rest of the row
    assert rows["cccccccccccccccc"]["kind"] == "CLIENT"


def test_sql_and_no_aws_resource(spark):
    """sql.go URL split -> db.connection_string + db.name; a segment with
    no aws block gets cloud.provider=unknown (aws.go:31-36)."""
    doc = json.dumps({
        "name": "q", "id": "aaaaaaaaaaaaaaaa", "trace_id": TRACE,
        "start_time": 1.0, "namespace": "remote",
        "parent_id": "bbbbbbbbbbbbbbbb",
        "sql": {"url": "postgresql://db.example:5432/orders?ssl=true",
                "database_type": "postgresql", "user": "app",
                "sanitized_query": "SELECT 1"},
    })
    row = _decode(spark, doc)[0]
    assert row["kind"] == "CLIENT"
    assert row["attrs"]["db.connection_string"] == \
        "postgresql://db.example:5432"
    assert row["attrs"]["db.name"] == "orders"
    assert row["attrs"]["db.system"] == "postgresql"
    assert row["attrs"]["db.user"] == "app"
    assert row["resource"]["cloud.provider"] == "unknown"


def test_exporter_roundtrip(spark):
    """decode(make_segments(x)) ≡ x on the non-lossy fields: trace id,
    span id, parent, timestamps, http method/url/status, enduser.id.
    (Name goes through the exporter's naming ladder and kind through
    namespace — both documented lossy.)"""
    now = 1_600_000_000
    src = spark.createDataFrame(
        [
            (f"{now - 100:08x}" + "ab" * 12, "11" * 8, "", "op-a", "SERVER",
             "OK", 12.0, 12.5,
             {"http.method": "GET", "http.url": "https://x/y",
              "http.status_code": "200", "enduser.id": "u1"},
             {"service.name": "websvc"}),
            (f"{now - 100:08x}" + "cd" * 12, "22" * 8, "aa" * 8, "op-b",
             "CLIENT", "ERROR", 13.0, 14.25,
             {"http.method": "POST", "http.url": "https://x/z",
              "http.status_code": "503"},
             {"service.name": "websvc"}),
        ],
        "trace_id STRING, span_id STRING, parent_span_id STRING, "
        "name STRING, kind STRING, status_code STRING, start_ts DOUBLE, "
        "end_ts DOUBLE, attrs MAP<STRING,STRING>, "
        "resource MAP<STRING,STRING>",
    )
    docs = xtx.to_segment_docs(xtx.make_segments(src, now))
    back = {r["span_id"]: r
            for r in xrx.segments_to_spans(docs, max_depth=1).collect()}
    orig = {r["span_id"]: r for r in src.collect()}
    assert set(back) == set(orig)
    for sid, o in orig.items():
        b = back[sid]
        assert b["valid"]
        assert b["trace_id"] == o["trace_id"]
        assert b["parent_span_id"] == (o["parent_span_id"] or None)
        assert b["start_ts"].timestamp() == o["start_ts"]
        assert b["end_ts"].timestamp() == o["end_ts"]
        assert b["attrs"]["http.method"] == o["attrs"]["http.method"]
        assert b["attrs"]["http.url"] == o["attrs"]["http.url"]
        assert b["attrs"]["http.status_code"] == o["attrs"]["http.status_code"]
        if "enduser.id" in o["attrs"]:
            assert b["attrs"]["enduser.id"] == o["attrs"]["enduser.id"]
    # 503 -> ERROR, 200 -> UNSET through the decode status mapping
    assert back["22" * 8]["status_code"] == "ERROR"
    assert back["11" * 8]["status_code"] == "UNSET"


# -- per-level cache discipline (VERDICT r4 item 2) ---------------------------


def test_levels_pinned_once_per_invocation(spark):
    """segments_to_spans pins one persisted DataFrame per nesting level
    under a single cacheutil key; a later invocation evicts the previous
    chain, never its own mid-build."""
    from opentelemetry_collector_contrib_spark import cacheutil

    doc = json.dumps({
        "name": "svc", "id": "aaaaaaaaaaaaaaaa", "trace_id": TRACE,
        "start_time": 1.0, "end_time": 2.0,
        "subsegments": [{
            "name": "inner", "id": "bbbbbbbbbbbbbbbb",
            "start_time": 1.1, "end_time": 1.9,
        }],
    })
    docs = spark.createDataFrame([(doc,)], "doc STRING")
    out = xrx.segments_to_spans(docs, max_depth=4)
    assert out.count() == 2
    chain = cacheutil._TRACKED.get("xray_levels", [])
    # level 0 (root), level 1 (subsegment), level 2 (empty, early exit)
    assert 2 <= len(chain) <= 4
    assert all(df.storageLevel.useMemory for df in chain)
    xrx.segments_to_spans(docs, max_depth=4).count()
    assert 2 <= len(cacheutil._TRACKED.get("xray_levels", [])) <= 4
    cacheutil.release("xray_levels")
