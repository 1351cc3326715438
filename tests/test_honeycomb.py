"""honeycomb exporter translation vs exporter/honeycombexporter semantics."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, DoubleType, MapType, StringType, StructField, StructType,
)

from opentelemetry_collector_contrib_spark.sinks import honeycomb

SM = MapType(StringType(), StringType())
SCHEMA = StructType([
    StructField("trace_id", StringType()),
    StructField("span_id", StringType()),
    StructField("parent_span_id", StringType()),
    StructField("name", StringType()),
    StructField("kind", StringType()),
    StructField("status_code", StringType()),
    StructField("status_message", StringType()),
    StructField("start_ts", DoubleType()),
    StructField("end_ts", DoubleType()),
    StructField("attrs", SM),
    StructField("resource", SM),
    StructField("library_name", StringType()),
    StructField("library_version", StringType()),
    StructField("links", ArrayType(StructType([
        StructField("trace_id", StringType()),
        StructField("span_id", StringType()),
        StructField("attrs", SM),
    ]))),
    StructField("events", ArrayType(StructType([
        StructField("ts", DoubleType()),
        StructField("name", StringType()),
        StructField("attrs", SM),
    ]))),
])

LONG_TID = "deadbeef" * 4
SHORT_TID = "0" * 16 + "cafe" * 4


def _span(**kw):
    base = dict(trace_id=LONG_TID, span_id="ab12", parent_span_id="",
                name="op", kind="SERVER", status_code="OK", status_message="",
                start_ts=1.0, end_ts=1.25, attrs={}, resource={},
                library_name="", library_version="", links=[], events=[])
    base.update(kw)
    return tuple(base[f.name] for f in SCHEMA.fields)


def test_trace_id_short_form_and_overlay(spark):
    df = spark.createDataFrame([
        _span(trace_id=SHORT_TID, attrs={"color": "span"},
              resource={"color": "res", "host": "h1"},
              library_name="sdk", library_version="2"),
        _span(kind="PRODUCER", attrs={"sampleRate": "5"}),
    ], SCHEMA)
    rows = honeycomb.to_events(df, sample_rate_attr="sampleRate").collect()
    assert rows[0].trace_id == "cafe" * 4            # zero high half dropped
    assert rows[1].trace_id == LONG_TID
    assert rows[0].fields == {"color": "span", "host": "h1"}  # span attr wins
    assert rows[0].library_name == "sdk" and rows[1].library_name is None
    assert rows[0].duration_ms == 250.0
    assert rows[0].samplerate == 1 and rows[1].samplerate == 5
    assert rows[1].span_kind == "producer"
    assert rows[0].parent_id is None                 # empty parent omitted


def test_link_and_message_events(spark):
    df = spark.createDataFrame([
        _span(links=[(SHORT_TID, "ff00", {"k": "v"})],
              events=[(1.1, "exception", {"msg": "bad"})],
              resource={"svc": "web"}),
    ], SCHEMA)
    links = honeycomb.link_events(df).collect()
    assert len(links) == 1
    assert links[0].annotation_type == "link"
    assert links[0].link_trace_id == "cafe" * 4 and links[0].parent_id == "ab12"
    msgs = honeycomb.message_events(df).collect()
    assert msgs[0].annotation_type == "span_event"
    assert msgs[0].parent_name == "op" and msgs[0].name == "exception"
    assert msgs[0].fields == {"svc": "web", "msg": "bad"}  # resource underlay
