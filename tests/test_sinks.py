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


def test_sapm_gzip_roundtrip_and_token_scrub(spark):
    """exporter.go:96-165: token-batched, token-scrubbed, gzip'd payloads.
    gzip bytes are deterministic (mtime=0) and decompress back to the
    canonical payload; disable_compression nulls the gzip column."""
    import gzip

    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import sapm

    df = spark.createDataFrame(
        [("t1", "s2", "b", "tokA", "svc1"),
         ("t1", "s1", "a", "tokA", "svc1"),
         ("t2", "s3", "c", "tokB", "svc1")],
        "trace_id STRING, span_id STRING, name STRING, tok STRING, svc STRING",
    ).select(
        "trace_id", "span_id", "name",
        F.create_map(
            F.lit(sapm.TOKEN_ATTR), F.col("tok"),
            F.lit("service.name"), F.col("svc"),
        ).alias("resource"),
    )
    out = {r["access_token"]: r for r in sapm.sapm_batches(df).collect()}
    a = out["tokA"]
    assert a["n_spans"] == 2 and a["n_traces"] == 1
    # scrub: the token appears in neither tags nor payload
    assert a["process_tags"] == "service.name=svc1"
    assert "tokA" not in a["payload"]
    # canonical order: spans sorted by (trace_id, span_id)
    assert a["payload"].index('"s1"') < a["payload"].index('"s2"')
    # deterministic gzip roundtrip
    assert gzip.decompress(bytes(a["payload_gzip"])).decode() == a["payload"]
    again = {
        r["access_token"]: r for r in sapm.sapm_batches(df).collect()
    }
    assert bytes(again["tokA"]["payload_gzip"]) == bytes(a["payload_gzip"])
    off = sapm.sapm_batches(df, disable_compression=True).collect()
    assert all(r["payload_gzip"] is None for r in off)


def test_newrelic_log_translation(spark):
    """transformer.go:121-167: message falls back to the record name,
    guarded trace/span/severity entries, override keys dropped."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import newrelic

    df = spark.createDataFrame(
        [("hello", "n1", "t1", "s1", "ERROR", 17, "2024-01-01 00:00:01"),
         ("", "n2", "", "", "", 0, "2024-01-01 00:00:02")],
        "body STRING, name STRING, trace_id STRING, span_id STRING, "
        "severity_text STRING, severity_number INT, ts_s STRING",
    ).select(
        "*", F.to_timestamp("ts_s").alias("ts"),
        F.create_map(
            F.lit("k"), F.lit("v"),
            F.lit("collector.name"), F.lit("spoof"),
        ).alias("attrs"),
    )
    got = {r["attributes"]["name"]: r for r in newrelic.newrelic_logs(df).collect()}
    full = got["n1"]
    assert full["message"] == "hello"
    assert full["attributes"]["trace.id"] == "t1"
    assert full["attributes"]["log.level"] == "ERROR"
    assert full["attributes"]["log.levelNum"] == "17"
    assert full["attributes"]["k"] == "v"
    assert "collector.name" not in full["attributes"]
    bare = got["n2"]
    assert bare["message"] == "n2"  # body empty -> record name
    for absent in ("trace.id", "span.id", "log.level", "log.levelNum"):
        assert absent not in bare["attributes"]


def test_azuremonitor_envelope_semantics(spark):
    """trace_to_envelope.go:53-156: kind normalization (UNSPECIFIED ->
    INTERNAL -> InProc dependency), faas unsupported, duration format
    day overflow, http success window edges."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import azuremonitor

    base = dict(
        trace_id="t", parent_span_id="p", name="op",
        status_code="STATUS_CODE_OK", status_message="",
        lib_name="l", lib_version="1",
    )
    rows = [
        {**base, "kind": "SPAN_KIND_UNSPECIFIED", "tag": "internal",
         "attrs": {}, "resource": {"service.name": "s"}},
        {**base, "kind": "SPAN_KIND_SERVER", "tag": "faas",
         "attrs": {"faas.trigger": "http"}, "resource": {}},
        {**base, "kind": "SPAN_KIND_SERVER", "tag": "http99",
         "attrs": {"http.method": "GET", "http.status_code": "99"},
         "resource": {}},
        {**base, "kind": "SPAN_KIND_SERVER", "tag": "http400",
         "attrs": {"http.method": "GET", "http.status_code": "400"},
         "resource": {}},
    ]
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (r["trace_id"], r["parent_span_id"], r["name"], r["kind"],
             r["status_code"], r["status_message"], t0,
             t0 + datetime.timedelta(days=3, hours=4, minutes=5, seconds=6,
                                     microseconds=7),
             r["attrs"], r["resource"], r["lib_name"], r["lib_version"],
             r["tag"])
            for r in rows
        ],
        "trace_id STRING, parent_span_id STRING, name STRING, kind STRING, "
        "status_code STRING, status_message STRING, start_ts TIMESTAMP, "
        "end_ts TIMESTAMP, attrs MAP<STRING,STRING>, "
        "resource MAP<STRING,STRING>, lib_name STRING, lib_version STRING, "
        "tag STRING",
    )
    # spans_to_envelopes preserves row order (pure projection)
    out = dict(
        zip(
            [x["tag"] for x in rows],
            azuremonitor.spans_to_envelopes(df.coalesce(1)).collect(),
        )
    )
    internal = out["internal"]
    assert internal["envelope_name"].endswith("RemoteDependency")
    assert internal["dependency_type"] == "InProc"
    assert internal["duration"] == "03.04:05:06.000007"
    assert out["faas"]["valid"] is False
    # http.status_code 99 is outside 100..399 -> success False; 400 too;
    # the code string still overrides the default
    assert out["http99"]["response_code"] == "99" and not out["http99"]["success"]
    assert out["http400"]["response_code"] == "400" and not out["http400"]["success"]
    # RFC3339Nano envelope time (time_utils.go): whole-second start stamp
    # carries no fractional part, dot dropped like Go's format
    assert out["internal"]["time"] == "2024-01-01T00:00:00Z"


def test_azuremonitor_fractional_envelope_time(spark):
    """trace_to_envelope.go:77 formats envelope time as RFC3339Nano —
    sub-second start stamps keep their fraction with trailing zeros
    trimmed, exactly as Go renders them."""
    import datetime

    from opentelemetry_collector_contrib_spark.sinks import azuremonitor

    t = datetime.datetime(2024, 1, 1, 12, 30, 5, 640140)
    df = spark.createDataFrame(
        [("t", "p", "op", "SPAN_KIND_SERVER", "STATUS_CODE_OK", "",
          t, t + datetime.timedelta(seconds=1), {}, {}, "l", "1")],
        "trace_id STRING, parent_span_id STRING, name STRING, kind STRING, "
        "status_code STRING, status_message STRING, start_ts TIMESTAMP, "
        "end_ts TIMESTAMP, attrs MAP<STRING,STRING>, "
        "resource MAP<STRING,STRING>, lib_name STRING, lib_version STRING",
    )
    row = azuremonitor.spans_to_envelopes(df).collect()[0]
    # Go: time.Unix(..., 640140000).UTC().Format(time.RFC3339Nano)
    # == "2024-01-01T12:30:05.64014Z" (trailing zero trimmed)
    assert row["time"] == "2024-01-01T12:30:05.64014Z"


def test_newrelic_own_attr_overrides_computed(spark):
    """transformer.go SpanAttributes writes the span's own attributes into
    the Go map LAST — a span attr named otel.status_code / span.kind must
    overwrite the computed entry (not be dropped)."""
    import datetime

    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import newrelic

    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("s1", "t1", "", "op", "STATUS_CODE_ERROR", "boom",
          "SPAN_KIND_SERVER", 2, 0, t0, t0)],
        "span_id STRING, trace_id STRING, parent_id STRING, name STRING, "
        "status_code STRING, status_message STRING, kind STRING, "
        "dropped_attributes_count LONG, dropped_events_count LONG, "
        "start_ts TIMESTAMP, end_ts TIMESTAMP",
    ).select(
        "*",
        F.create_map(
            F.lit("otel.status_code"), F.lit("MY_OWN"),
            F.lit("span.kind"), F.lit("my_kind"),
            F.lit("plain"), F.lit("v"),
        ).alias("attrs"),
        F.create_map().cast("map<string,string>").alias("resource"),
    ).withColumn("lib_name", F.lit("")).withColumn("lib_version", F.lit(""))
    row = newrelic.newrelic_spans(df).collect()[0]
    attrs = row["attributes"]
    assert attrs["otel.status_code"] == "MY_OWN"
    assert attrs["span.kind"] == "my_kind"
    assert attrs["plain"] == "v"
    # non-colliding computed entries still present
    assert attrs["otel.status_description"] == "boom"
    assert attrs["otel.dropped_attributes_count"] == "2"


def test_sapm_receiver_decode_roundtrip(spark):
    """trace_receiver.go:64-99: the receiver is the exporter's exact
    inverse — gzip'd batches decode to span rows, the out-of-band token
    upserted back into resource attrs (AccessTokenPassthrough,
    trace_receiver.go:80-89), stale payload-side tokens replaced."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import sapm
    from opentelemetry_collector_contrib_spark.sources import sapm as sapm_rx

    df = spark.createDataFrame(
        [("t1", "s2", "b", "tokA", "svc1"),
         ("t1", "s1", "a", "tokA", "svc1"),
         ("t2", "s3", "c", "tokB", "svc2"),
         ("t3", "s4", "d", None, "svc3")],  # no token -> '' cohort
        "trace_id STRING, span_id STRING, name STRING, tok STRING, svc STRING",
    ).select(
        "trace_id", "span_id", "name",
        F.when(
            F.col("tok").isNotNull(),
            F.create_map(
                F.lit(sapm.TOKEN_ATTR), F.col("tok"),
                F.lit("service.name"), F.col("svc"),
            ),
        ).otherwise(
            F.create_map(F.lit("service.name"), F.col("svc"))
        ).alias("resource"),
    )
    batches = sapm.sapm_batches(df)

    # full path: decode from the GZIP column
    decoded = sapm_rx.parse_sapm_batches(batches)
    got = {
        (r["trace_id"], r["span_id"], r["name"],
         dict(r["resource"]).get(sapm.TOKEN_ATTR),
         dict(r["resource"])["service.name"])
        for r in decoded.collect()
    }
    want = {
        ("t1", "s2", "b", "tokA", "svc1"),
        ("t1", "s1", "a", "tokA", "svc1"),
        ("t2", "s3", "c", "tokB", "svc2"),
        ("t3", "s4", "d", None, "svc3"),  # empty token: NOT upserted
    }
    assert got == want

    # uncompressed path: gzip_col=None reads the JSON payload directly
    plain = sapm.sapm_batches(df, disable_compression=True)
    got2 = {
        (r["trace_id"], r["span_id"], r["name"])
        for r in sapm_rx.parse_sapm_batches(plain, gzip_col=None).collect()
    }
    assert got2 == {(t, s, n) for t, s, n, _, _ in want}

    # UPSERT semantics: a stale token in the tags is REPLACED by the
    # out-of-band one (UpsertString, not insert-if-absent)
    forged = batches.withColumn(
        "process_tags",
        F.concat(F.lit(sapm.TOKEN_ATTR + "=stale,"), F.col("process_tags")),
    ).filter(F.col("access_token") == "tokA")
    re_decoded = sapm_rx.parse_sapm_batches(forged).collect()
    assert all(
        dict(r["resource"])[sapm.TOKEN_ATTR] == "tokA" for r in re_decoded
    )


def test_tanzu_span_translation(spark):
    """transformer.go:58-220: UUID forms (span ids LEFT-padded to 16
    bytes), required-tag promotion/deletion/defaults, later-wins tag
    merge, kind ladder incl. unknown, error status with 240-byte message
    truncation, unset-end duration clamp, uuid.Nil parent."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import tanzu

    rows = [
        # (trace, span, parent, name, kind, code, msg, start, end, res, attrs)
        ("0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331", "",
         "ok-span", "SERVER", 0, "", 1_700_000_000_000_000_000,
         1_700_000_000_250_000_000,
         {"service.name": "checkout", "env": "prod"}, {"env": "stage"}),
        ("0af7651916cd43dd8448eb211c80319c", "00f067aa0ba902b7",
         "b7ad6b7169203331", "err-span", "WEIRD", 2, "m" * 300,
         1_700_000_000_000_000_000, 0,
         {"service": "svc-x", "application": "app-x"}, {}),
        ("not-hex", "b7ad6b7169203331", "", "bad-trace", "CLIENT", 1, "",
         1_700_000_000_000_000_000, 1_700_000_001_000_000_000, {}, {}),
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id STRING, span_id STRING, parent_id STRING, name STRING,"
        " kind STRING, status_code INT, status_message STRING,"
        " start_ns LONG, end_ns LONG, resource MAP<STRING,STRING>,"
        " attributes MAP<STRING,STRING>",
    )
    out = {r["name"]: r for r in tanzu.tanzu_spans(df).collect()}

    ok = out["ok-span"]
    assert ok["trace_uuid"] == "0af76519-16cd-43dd-8448-eb211c80319c"
    # span id left-padded to 16 bytes before UUID formatting
    assert ok["span_uuid"] == "00000000-0000-0000-b7ad-6b7169203331"
    assert ok["parent_uuid"] == tanzu.NIL_UUID
    assert ok["start_millis"] == 1_700_000_000_000
    assert ok["duration_millis"] == 250
    tags = dict(ok["tags"])
    # service.name promoted into service AND deleted; application default
    assert tags["service"] == "checkout" and "service.name" not in tags
    assert tags["application"] == tanzu.DEFAULT_APPLICATION
    # span attr overwrites resource attr (later wins)
    assert tags["env"] == "stage"
    assert tags["span.kind"] == "server" and tags["status.code"] == "0"
    assert "error" not in tags and ok["valid"]

    err = out["err-span"]
    etags = dict(err["tags"])
    assert etags["span.kind"] == "unknown"          # unmapped kind
    assert etags["error"] == "true"
    assert len(etags["status.message"]) == 240      # 255 - len(label+'=')
    assert etags["service"] == "svc-x"              # explicit service kept
    assert etags["application"] == "app-x"
    assert err["duration_millis"] == 0              # unset end clamps
    assert err["parent_uuid"] == "00000000-0000-0000-b7ad-6b7169203331"

    bad = out["bad-trace"]
    assert bad["trace_uuid"] is None and not bad["valid"]
    assert dict(bad["tags"])["service"] == tanzu.DEFAULT_SERVICE


def test_humio_event_semantics(spark):
    """traces_exporter.go:118-198: missing service.name refuses the span,
    resource WINS attr collisions (toHumioAttributes assignment order),
    service.name is deleted after promotion, empty library info is
    omitted, tag strategies select trace id / service / none."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import humio

    df = spark.createDataFrame(
        [
            ("t1", "s1", "", "a", "SPAN_KIND_SERVER", "STATUS_CODE_OK", "",
             100, 200, {"service.name": "svc", "shared": "res"},
             {"shared": "span", "only": "x"}, "lib", "2.0"),
            ("t2", "s2", "p", "b", "SPAN_KIND_CLIENT", "STATUS_CODE_UNSET",
             "", 300, 400, {"env": "prod"}, {}, "", ""),  # no service.name
        ],
        "trace_id STRING, span_id STRING, parent_id STRING, name STRING,"
        " kind STRING, status_code STRING, status_message STRING,"
        " start_ns LONG, end_ns LONG, resource MAP<STRING,STRING>,"
        " attributes MAP<STRING,STRING>, lib_name STRING, lib_version STRING",
    )
    out = {r["name"]: r for r in humio.humio_events(
        df, tag_strategy=humio.TAG_SERVICE_NAME).collect()}
    a = out["a"]
    attrs = dict(a["attributes"])
    assert a["valid"] and a["service_name"] == "svc" and a["tag"] == "svc"
    assert "service.name" not in attrs          # promoted AND deleted
    assert attrs["shared"] == "res"             # resource wins collision
    assert attrs["only"] == "x"
    assert attrs[humio.LIB_NAME_KEY] == "lib"
    assert attrs[humio.LIB_VERSION_KEY] == "2.0"
    assert a["timestamp"] == 100                # unix ns = start
    b = out["b"]
    assert not b["valid"] and b["service_name"] == ""
    assert humio.LIB_NAME_KEY not in dict(b["attributes"])  # empty omitted

    by_trace = humio.humio_events(df, tag_strategy=humio.TAG_TRACE_ID)
    assert {r["tag"] for r in by_trace.collect()} == {"t1", "t2"}
    untagged = humio.humio_events(df, tag_strategy=humio.TAG_NONE)
    assert {r["tag"] for r in untagged.collect()} == {""}


def test_sls_log_translation(spark):
    """tracedata_to_logservice.go:74-157: end-second Time (NULL when end
    unset), host/service promotion out of the resource JSON, microsecond
    time strings, OpenTracing kind shorts, sorted-key attribute JSON."""
    from opentelemetry_collector_contrib_spark.sinks import alibabacloud

    df = spark.createDataFrame(
        [
            ("t1", "s1", "", "a", "SPAN_KIND_CLIENT", "STATUS_CODE_OK",
             "", 1_000_000_000_000, 1_000_000_007_000,
             {"host.name": "h1", "service.name": "svc", "env": "prod"},
             {"zz": "2", "aa": "1"}, "lib", "1.0"),
            ("t2", "s2", "p", "b", "SPAN_KIND_WEIRD", "STATUS_CODE_UNSET",
             "", 2_000_000_000_000, 0, {}, {}, "", ""),
        ],
        "trace_id STRING, span_id STRING, parent_id STRING, name STRING,"
        " kind STRING, status_code STRING, status_message STRING,"
        " start_ns LONG, end_ns LONG, resource MAP<STRING,STRING>,"
        " attributes MAP<STRING,STRING>, lib_name STRING, lib_version STRING",
    )
    out = {r["name"]: r for r in alibabacloud.sls_logs(df).collect()}
    a = out["a"]
    assert a["time"] == 1000                       # end_ns // 1e9
    assert (a["host"], a["service"]) == ("h1", "svc")
    assert a["resource"] == '{"env":"prod"}'       # promoted keys excluded
    assert a["attribute"] == '{"aa":"1","zz":"2"}'  # sorted like json.Marshal
    assert (a["start"], a["end"], a["duration"]) == (
        "1000000000", "1000000007", "7")
    assert (a["kind"], a["statusCode"]) == ("client", "OK")
    b = out["b"]
    assert b["time"] is None                       # unset end: server-stamped
    assert (b["host"], b["service"], b["resource"]) == ("", "", "{}")
    assert (b["kind"], b["statusCode"]) == ("unspecified", "UNSET")


def test_uptrace_span_translation(spark):
    """translator.go:27-53 + exporter.go:61-77: little-endian uint64 ids
    (full unsigned range), UNSPECIFIED folds to internal, null attr
    entries dropped, raw ns times."""
    from opentelemetry_collector_contrib_spark.sinks import uptrace

    df = spark.createDataFrame(
        [
            ("t1", "0100000000000000", "", "a", "SPAN_KIND_UNSPECIFIED",
             "STATUS_CODE_OK", "", 100, 200,
             {"env": "prod"}, {"k": "v", "n": None}, "lib", "1.0"),
            ("t2", "ffffffffffffffff", "0200000000000000", "b",
             "SPAN_KIND_SERVER", "STATUS_CODE_ERROR", "boom", 300, 400,
             {}, {}, "", ""),
        ],
        "trace_id STRING, span_id STRING, parent_id STRING, name STRING,"
        " kind STRING, status_code STRING, status_message STRING,"
        " start_ns LONG, end_ns LONG, resource MAP<STRING,STRING>,"
        " attributes MAP<STRING,STRING>, lib_name STRING, lib_version STRING",
    )
    out = {r["name"]: r for r in uptrace.uptrace_spans(df).collect()}
    a = out["a"]
    # 0x01 in byte 0 little-endian = 1
    assert a["id"] == "1" and a["parent_id"] == "0"
    assert a["kind"] == "internal"           # UNSPECIFIED folds in
    assert dict(a["attrs"]) == {"k": "v"}    # null entry dropped
    assert (a["start_time"], a["end_time"]) == (100, 200)
    b = out["b"]
    # full unsigned range survives (exceeds signed int64)
    assert b["id"] == "18446744073709551615"
    assert b["parent_id"] == "2"
    assert (b["kind"], b["status_code"], b["status_message"]) == (
        "server", "error", "boom")


def test_elastic_doc_semantics(spark):
    """traces.go:42-357: root-or-SERVER transaction split, type ladders,
    destination resource default-port append, outcome/result mapping,
    label-key cleaning, service-name sanitization."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks import elastic

    df = spark.createDataFrame(
        [
            # root client span -> transaction (root wins over kind)
            ("t", "s1", "", "root-client", "SPAN_KIND_CLIENT",
             "STATUS_CODE_OK", 0, 1_500_000,
             {"http.method": "GET"}, {"service.name": "my svc!"}),
            # non-root SERVER -> transaction
            ("t", "s2", "p", "server", "SPAN_KIND_SERVER",
             "STATUS_CODE_ERROR", 0, 2_000_000, {}, {}),
            # non-root client with http.url, explicit port
            ("t", "s3", "p", "http-span", "SPAN_KIND_CLIENT",
             "STATUS_CODE_UNSET", 0, 0,
             {"http.url": "http://h.example:8080/x"}, {}),
            # non-root client with https url, default port appended
            ("t", "s4", "p", "https-span", "SPAN_KIND_CLIENT",
             "STATUS_CODE_UNSET", 0, 0,
             {"http.url": "https://h.example/x"}, {}),
            # db span
            ("t", "s5", "p", "db-span", "SPAN_KIND_CLIENT",
             "STATUS_CODE_UNSET", 0, 0, {"db.system": "mysql"}, {}),
            # plain app span with a label key needing cleaning
            ("t", "s6", "p", "app-span", "SPAN_KIND_CLIENT",
             "STATUS_CODE_UNSET", 0, 0, {'weird.key*"x': "v"}, {}),
        ],
        "trace_id STRING, span_id STRING, parent_id STRING, name STRING,"
        " kind STRING, status_code STRING, start_ns LONG, end_ns LONG,"
        " attributes MAP<STRING,STRING>, resource MAP<STRING,STRING>",
    )
    out = {r["name"]: r for r in elastic.elastic_docs(df).collect()}
    rc = out["root-client"]
    assert rc["doc_type"] == "transaction" and rc["type"] == "request"
    assert rc["result"] == "OK" and rc["outcome"] == "success"
    assert rc["duration_ms"] == 1.5          # fractional millis
    assert rc["service_name"] == "my svc_"   # '!' sanitized
    sv = out["server"]
    assert sv["doc_type"] == "transaction" and sv["type"] == "unknown"
    assert sv["result"] == "Error" and sv["outcome"] == "failure"
    h = out["http-span"]
    assert (h["doc_type"], h["type"], h["subtype"]) == ("span", "external", "http")
    assert h["destination_resource"] == "h.example:8080"
    assert h["outcome"] == ""                # UNSET: server decides
    hs = out["https-span"]
    assert hs["destination_resource"] == "h.example:443"  # default appended
    db = out["db-span"]
    assert (db["type"], db["subtype"], db["destination_resource"]) == (
        "db", "mysql", "mysql")
    app = out["app-span"]
    assert app["type"] == "app" and app["subtype"] is None
    assert dict(app["labels"]) == {"weird_key__x": "v"}
