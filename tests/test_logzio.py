"""logzio exporter — Jaeger-model mapping semantics.

Oracle: exporter/logzioexporter/exporter.go:98-112 (per-span write, bad
spans dropped, per-span process embedding) with the in-reference Jaeger
translation ladder of
exporter/jaegerthrifthttpexporter/protospan_to_jaegerthrift.go.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, MapType, StringType, StructField,
    StructType,
)

from opentelemetry_collector_contrib_spark.sinks import logzio

TAG_T = ArrayType(StructType([
    StructField("key", StringType()),
    StructField("vtype", StringType()),
    StructField("value", StringType()),
]))
LINK_T = ArrayType(StructType([
    StructField("trace_id", StringType()),
    StructField("span_id", StringType()),
    StructField("is_parent", BooleanType()),
]))
SCHEMA = StructType([
    StructField("trace_id", StringType()),
    StructField("span_id", StringType()),
    StructField("parent_span_id", StringType()),
    StructField("name", StringType()),
    StructField("kind", StringType()),
    StructField("status_code", LongType()),
    StructField("status_message", StringType()),
    StructField("attrs", TAG_T),
    StructField("links", LINK_T),
    StructField("service_name", StringType()),
    StructField("resource", MapType(StringType(), StringType())),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
])

T32 = "000000000000000a000000000000000b"   # high 10, low 11


def _row(**kw):
    base = dict(
        trace_id=T32, span_id="00000000000000ff", parent_span_id="",
        name="op", kind="SPAN_KIND_UNSPECIFIED", status_code=None,
        status_message="", attrs=[], links=[], service_name="svc",
        resource={}, start_us=1_000_123, end_us=1_500_123,
    )
    base.update(kw)
    return base


def _one(spark, **kw):
    df = spark.createDataFrame([_row(**kw)], SCHEMA)
    return logzio.logzio_docs(df).collect()[0]


def test_ids_times_and_type(spark):
    r = _one(spark)
    assert (r.trace_id_high, r.trace_id_low) == (10, 11)
    assert r.span_id_long == 255
    assert r.parent_span_id_long == 0          # empty parent -> 0 (:212-219)
    assert (r.start_us, r.start_ms, r.duration_us) == (1_000_123, 1_000, 500_000)
    assert r.type == "span" and r.valid


def test_signed_int64_ids(spark):
    # ffff... -> -1 (int64(binary.BigEndian.Uint64), :493-509)
    r = _one(spark, trace_id="f" * 32, span_id="f" * 16)
    assert (r.trace_id_high, r.trace_id_low) == (-1, -1)
    assert r.span_id_long == -1 and r.valid


def test_invalid_and_zero_ids_dropped(spark):
    assert not _one(spark, trace_id="0" * 32).valid          # zero trace id
    assert not _one(spark, span_id="0" * 16).valid           # zero span id
    assert not _one(spark, span_id="nothex").valid
    assert not _one(spark, parent_span_id="zzzzzzzzzzzzzzzz").valid
    # zero PARENT is legal input shape (empty), nonzero half-zero trace ok
    assert _one(spark, trace_id="0" * 31 + "1").valid


def test_span_kind_tag_guard(spark):
    tags = {t.key: (t.vtype, t.value)
            for t in _one(spark, kind="SPAN_KIND_CLIENT").jaeger_tags}
    assert tags["span.kind"] == ("string", "client")
    tags = {t.key: t.value
            for t in _one(spark, kind="SPAN_KIND_SERVER").jaeger_tags}
    assert tags["span.kind"] == "server"
    # producer/consumer/internal/unspecified add no tag (:316-324)
    assert _one(spark, kind="SPAN_KIND_PRODUCER").jaeger_tags == []
    # attr-provided span.kind wins; no computed tag appended (:235-238)
    r = _one(spark, kind="SPAN_KIND_CLIENT",
             attrs=[("span.kind", "string", "spoof")])
    assert [(t.key, t.value) for t in r.jaeger_tags] == [("span.kind", "spoof")]


def test_status_tag_guard(spark):
    r = _one(spark, status_code=2, status_message="boom")
    tags = {t.key: (t.vtype, t.value) for t in r.jaeger_tags}
    assert tags["status.code"] == ("long", "2")
    assert tags["status.message"] == ("string", "boom")
    # empty message -> code only (:302-308)
    r = _one(spark, status_code=0, status_message="")
    assert [t.key for t in r.jaeger_tags] == ["status.code"]
    # nil status -> no tags (:291-293)
    assert _one(spark).jaeger_tags == []
    # either status attr suppresses BOTH computed tags (:239-243)
    r = _one(spark, status_code=2, status_message="boom",
             attrs=[("status.message", "string", "mine")])
    assert [(t.key, t.value) for t in r.jaeger_tags] == [
        ("status.message", "mine")]


def test_tags_canonically_sorted(spark):
    r = _one(spark, status_code=1, kind="SPAN_KIND_SERVER",
             attrs=[("zz", "long", "9"), ("aa", "string", "x")])
    assert [t.key for t in r.jaeger_tags] == [
        "aa", "span.kind", "status.code", "zz"]


def test_references(spark):
    r = _one(spark, links=[
        (T32, "0000000000000007", False),
        (T32, "0000000000000008", True),
    ])
    got = [(x.ref_type, x.trace_id_high, x.trace_id_low, x.span_id)
           for x in r.references]
    assert got == [("CHILD_OF", 10, 11, 8), ("FOLLOWS_FROM", 10, 11, 7)]


def test_process_fallback_and_resource_tags(spark):
    # no service info at all -> unknown-service-name (:31, :66-69)
    r = _one(spark, service_name="", resource={})
    assert r.service_name == logzio.UNKNOWN_SERVICE and r.process_tags == []
    # resource labels -> sorted string tags (:162-171); empty service kept
    # once ANY process info exists (:173-183)
    r = _one(spark, service_name="", resource={"b": "2", "a": "1"})
    assert r.service_name == ""
    assert [(t.key, t.vtype, t.value) for t in r.process_tags] == [
        ("a", "string", "1"), ("b", "string", "2")]


def test_nonempty_bad_parent_invalid_but_good_parent_ok(spark):
    r = _one(spark, parent_span_id="00000000000000aa")
    assert r.parent_span_id_long == 170 and r.valid
