"""Source (receiver-analogue) tests: syslog, multiline assembly, HEC.

Style mirrors the reference's table-driven processor tests (SURVEY.md
section 5): small hand-built inputs, hand-computed expected outputs.
"""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.sources import splunkhec, syslog
from opentelemetry_collector_contrib_spark.sources import text as src_text


def test_rfc5424_parse(spark):
    lines = [
        "<165>1 2024-01-02T03:04:05Z web01 nginx 4242 req [x@1 a=\"b\"] GET /index",
        "<34>1 2024-01-02T03:04:05.123Z db02 postgres - - - checkpoint done",
        "not a syslog line",
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    rows = {r["line"]: r for r in syslog.parse_rfc5424(df).collect()}

    r0 = rows[lines[0]]
    assert (r0["pri"], r0["facility"], r0["severity"]) == (165, 20, 5)
    assert r0["hostname"] == "web01" and r0["appname"] == "nginx"
    assert r0["procid"] == "4242" and r0["msgid"] == "req"
    assert r0["structured_data"] == '[x@1 a="b"]'
    assert r0["message"] == "GET /index" and r0["parse_ok"]

    r1 = rows[lines[1]]
    assert (r1["pri"], r1["facility"], r1["severity"]) == (34, 4, 2)
    assert r1["structured_data"] is None  # '-' nils out
    assert r1["message"] == "checkpoint done"

    assert not rows[lines[2]]["parse_ok"]


def test_rfc3164_parse(spark):
    df = spark.createDataFrame(
        [("<13>Feb  5 17:32:18 host1 su[123]: 'su root' failed",),
         ("<13>Feb  5 17:32:18 host1 cron: job started",)],
        "line string",
    )
    r0, r1 = syslog.parse_rfc3164(df).collect()
    assert (r0["facility"], r0["severity"]) == (1, 5)
    assert r0["appname"] == "su" and r0["procid"] == 123
    assert r0["message"] == "'su root' failed"
    assert r1["appname"] == "cron" and r1["procid"] is None
    assert r1["message"] == "job started"


def test_assemble_multiline(spark):
    # two files; continuation lines attach to the preceding start line;
    # a leading continuation (f2 offset 0) forms block 0
    data = [
        ("f1", 0, "START a"), ("f1", 1, "  cont1"), ("f1", 2, "  cont2"),
        ("f1", 3, "START b"),
        ("f2", 0, "orphan"), ("f2", 1, "START c"), ("f2", 2, "  tail"),
    ]
    df = spark.createDataFrame(data, "file string, off long, line string")
    out = {
        (r["file"], r["block"]): r
        for r in src_text.assemble_multiline(df, r"^START ", offset_col="off").collect()
    }
    assert out[("f1", 1)]["entry"] == "START a\n  cont1\n  cont2"
    assert out[("f1", 2)]["entry"] == "START b"
    assert out[("f2", 0)]["entry"] == "orphan"
    assert out[("f2", 1)]["entry"] == "START c\n  tail"
    assert out[("f1", 1)]["n_lines"] == 3
    assert out[("f2", 1)]["first_offset"] == 1


def test_hec_parse_refused(spark):
    df = spark.createDataFrame(
        [('{"time": 1700000000, "host": "h1", "source": "app",'
          ' "sourcetype": "st", "index": "main", "event": "hello",'
          ' "fields": {"k": "v"}}',),
         ("this is not json",)],
        "raw string",
    )
    rows = splunkhec.parse_hec_events(df).collect()
    ok = [r for r in rows if r["parse_ok"]]
    assert len(ok) == 1 and len(rows) == 2  # 1 accepted, 1 refused
    r = ok[0]
    assert r["host"] == "h1" and r["event"] == "hello"
    assert r["fields"]["k"] == "v"
    assert r["event_ts"].year == 2023


def test_read_lines_real_byte_offsets(spark, tmp_path):
    """(file, offset) lineage must be the line's actual byte offset in its
    file — resumable like stanza's offset store — independent of Spark's
    split scheduling (round-1 ADVICE: monotonically_increasing_id was not
    order-safe for multi-split files)."""
    import os

    f1 = tmp_path / "a.log"
    f1.write_bytes(b"START one\ncont two\ncont three\nSTART four\n")
    f2 = tmp_path / "b.log"
    f2.write_bytes(b"only line no trailing newline")

    out = src_text.read_lines(spark, str(tmp_path / "*.log")).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(os.path.basename(r["file"]), []).append(
            (r["offset"], r["line"])
        )
    a = sorted(by_file["a.log"])
    assert a == [
        (0, "START one"),
        (10, "cont two"),
        (19, "cont three"),
        (30, "START four"),
    ]
    # offsets are seekable positions: reading the file at each offset
    # yields the recorded line
    raw = f1.read_bytes()
    for off, line in a:
        assert raw[off : off + len(line.encode())].decode() == line
    assert sorted(by_file["b.log"]) == [(0, "only line no trailing newline")]

    # end-to-end: multiline assembly over the real offsets
    blocks = src_text.assemble_multiline(
        src_text.read_lines(spark, str(f1)), r"^START ", joiner="|"
    ).collect()
    entries = sorted(r["entry"] for r in blocks)
    assert entries == ["START four", "START one|cont two|cont three"]


def test_read_lines_encoded_and_exclude(spark, tmp_path):
    """Non-UTF8 charset decode + exclude-path regex
    (filelogreceiver README include/exclude/encoding config)."""
    (tmp_path / "app.log").write_bytes("café línea uno\nzwei\n".encode("latin-1"))
    (tmp_path / "skip.log").write_bytes(b"excluded\n")
    out = src_text.read_lines_encoded(
        spark, str(tmp_path / "*.log"), encoding="ISO-8859-1",
        exclude_pattern=r"skip\.log$",
    ).collect()
    lines = sorted((r["offset"], r["line"]) for r in out)
    assert lines == [(0, "café línea uno"), (1, "zwei")]


def test_file_fingerprints_stable_across_rename(spark, tmp_path):
    body = b"x" * 2000
    (tmp_path / "a.log").write_bytes(body)
    fp1 = src_text.file_fingerprints(spark, str(tmp_path / "a.log")).collect()[0]
    (tmp_path / "a.log").rename(tmp_path / "rotated.log")
    fp2 = src_text.file_fingerprints(spark, str(tmp_path / "rotated.log")).collect()[0]
    assert fp1["fingerprint"] == fp2["fingerprint"]
    assert fp1["file_bytes"] == 2000
    # fingerprint keys on the first `size` bytes only: appends don't change it
    with open(tmp_path / "rotated.log", "ab") as f:
        f.write(b"more")
    fp3 = src_text.file_fingerprints(spark, str(tmp_path / "rotated.log")).collect()[0]
    assert fp3["fingerprint"] == fp1["fingerprint"]
    assert fp3["file_bytes"] == 2004


def test_carbon_parse_reference_edge_cases(spark):
    """Table-driven against path_parser_helper.go:101-135 +
    plaintext_parser.go:51-90: exactly-3-parts, int-first value parse,
    integer-seconds timestamp, tag key '=' at index >= 1."""
    from opentelemetry_collector_contrib_spark.sources import carbon

    rows = [
        ("foo 1 1609459200",),            # minimal valid, int value
        ("foo;k=v;k2= 2.5 1609459200",),  # tags incl. empty value, float
        ("foo;=v 1 1",),                  # empty tag key -> invalid
        ("foo;k 1 1",),                   # tag without '=' -> invalid
        (";k=v 1 1",),                    # empty metric name -> invalid
        ("foo 1",),                       # 2 parts -> invalid
        ("foo 1 2 3",),                   # 4 parts -> invalid
        ("foo bar 1",),                   # non-numeric value -> invalid
        ("foo 1 1.5",),                   # fractional timestamp -> invalid
    ]
    df = spark.createDataFrame(rows, "line STRING")
    out = carbon.parse_carbon_lines(df).collect()
    by_line = dict(zip([r[0] for r in rows], out))

    ok = by_line["foo 1 1609459200"]
    assert ok["valid"] and ok["metric_name"] == "foo" and ok["is_int"]
    assert ok["value"] == 1.0 and ok["tags"] == {}

    tagged = by_line["foo;k=v;k2= 2.5 1609459200"]
    assert tagged["valid"] and not tagged["is_int"]
    assert tagged["tags"] == {"k": "v", "k2": ""}
    assert tagged["value"] == 2.5

    for bad in rows[2:]:
        assert not by_line[bad[0]]["valid"], f"expected invalid: {bad[0]}"


def test_carbon_roundtrip_lossless(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sources import carbon

    df = spark.createDataFrame(
        [("cpu", "a", 1.25, "2024-01-01 00:00:01"),
         ("cpu", "b", 3.0, "2024-01-01 00:00:02")],
        "name STRING, hostv STRING, v DOUBLE, ts_s STRING",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    lines = carbon.to_carbon_lines(df, "name", ["hostv"], "v", "ts")
    back = carbon.parse_carbon_lines(lines)
    got = {
        (r["metric_name"], r["tags"]["hostv"], r["value"], r["valid"])
        for r in back.collect()
    }
    assert got == {("cpu", "a", 1.25, True), ("cpu", "b", 3.0, True)}


def test_wavefront_parse_reference_cases(spark):
    """Table-driven against wavefront_parser.go:61-139 + buildLabels
    (:171-230): optional timestamp, quoted names/values, escape handling,
    full-consumption tag validation."""
    from opentelemetry_collector_contrib_spark.sources import wavefront

    rows = [
        ('cpu.load 1.5 1609459200 source=h1 dc="us west"',),
        ('"my.metric" 2 source=h1',),       # omitted ts -> null ts, valid
        ("cpu 1 notanumber",),              # 3rd token not ts, not tag -> invalid
        ("cpu 1",),                          # 2 parts -> invalid
        ("cpu x 1 source=h",),              # bad value -> invalid
        (r'cpu 1 1 k="a\"b"',),             # escaped quote in value
        ("cpu 1 1 source=h1 junk",),        # leftover non-tag junk -> invalid
        ("cpu 3 1 k=v=w",),                 # '=' in bare value is legal
    ]
    df = spark.createDataFrame(rows, "line STRING")
    out = {r_in[0]: r for r_in, r in zip(rows, wavefront.parse_wavefront_lines(df).collect())}

    full = out['cpu.load 1.5 1609459200 source=h1 dc="us west"']
    assert full["valid"] and not full["is_int"]
    assert full["tags"] == {"source": "h1", "dc": "us west"}
    assert full["ts"] is not None

    # NB: the reference splits the raw line on spaces BEFORE unquoting, so
    # a quoted name may not contain spaces (SplitN, wavefront_parser.go:62)
    nots = out['"my.metric" 2 source=h1']
    assert nots["valid"] and nots["metric_name"] == "my.metric"
    assert nots["ts"] is None and nots["tags"] == {"source": "h1"}
    assert nots["is_int"] and nots["value"] == 2.0

    esc = out[r'cpu 1 1 k="a\"b"']
    assert esc["valid"] and esc["tags"] == {"k": 'a"b'}

    eqv = out["cpu 3 1 k=v=w"]
    assert eqv["valid"] and eqv["tags"] == {"k": "v=w"}

    for bad in ("cpu 1 notanumber", "cpu 1", "cpu x 1 source=h",
                "cpu 1 1 source=h1 junk"):
        assert not out[bad]["valid"], f"expected invalid: {bad}"


def test_collectd_decode_reference_semantics(spark):
    """collectd.go: per-index guard, name building, bracket label
    extraction, label precedence, event routing."""
    import json as _json

    from opentelemetry_collector_contrib_spark.sources import collectd

    metric = {
        "dsnames": ["short", "long"],
        "dstypes": ["gauge", "derive"],
        "values": [1.5, 7],
        "time": 1609459200.25,
        "interval": 10.0,
        "host": "host[region=r1]-x",
        "plugin": "load",
        "plugin_instance": "pi[env=prod]",
        "type": "sys",
        "type_instance": "ti[zone=z1]",
    }
    ragged = {
        "dsnames": ["a", "b"],
        "dstypes": ["gauge"],          # i=1 skipped: no dstype
        "values": [2, None],           # i=1 also null
        "time": 1.0,
        "plugin": "p",
        "type": "t",
    }
    badbracket = {
        "dsnames": ["v"],
        "dstypes": ["counter"],
        "values": [3],
        "time": 1.0,
        "type": "t",
        "type_instance": "x[k=v,broken]",  # malformed piece voids bracket
    }
    event = {
        "time": 5.0,
        "severity": "warn",
        "message": "disk full",
    }
    df = spark.createDataFrame(
        [(_json.dumps(r),) for r in (metric, ragged, badbracket, event)],
        "json STRING",
    )
    rows = collectd.parse_collectd_records(df).collect()
    points = [r for r in rows if not r["is_event"]]
    events = [r for r in rows if r["is_event"]]

    assert len(events) == 1
    assert events[0]["message"] == "disk full" and events[0]["severity"] == "warn"

    by_name = {r["metric_name"]: r for r in points}
    # metric: two datapoints named type.cleaned_ti.dsname
    p0 = by_name["sys.ti.short"]
    assert p0["value"] == 1.5 and p0["is_double"] and not p0["is_cumulative"]
    assert p0["labels"]["zone"] == "z1"          # ti bracket dim
    assert p0["labels"]["plugin"] == "load"
    assert p0["labels"]["env"] == "prod"         # pi bracket dim
    assert p0["labels"]["plugin_instance"] == "pi"
    assert p0["labels"]["region"] == "r1"        # host bracket dim
    assert p0["labels"]["host"] == "host-x"
    assert "dsname" not in p0["labels"]          # folded into the name
    p1 = by_name["sys.ti.long"]
    assert p1["value"] == 7.0 and not p1["is_double"] and p1["is_cumulative"]

    # ragged: only i=0 survives the guard; single dsname in name? two
    # dsnames exist so the name still uses it
    assert "t.a" in by_name and "t.b" not in by_name
    assert by_name["t.a"]["value"] == 2.0

    # malformed bracket: original type_instance kept verbatim, no dims;
    # single dsname -> dsname becomes a label, not part of the name
    pb = by_name["t.x[k=v,broken]"]
    assert pb["is_cumulative"]
    assert pb["labels"].get("k") is None
    assert pb["labels"]["dsname"] == "v"


def test_influx_line_protocol_decode(spark):
    """Line-protocol subset contract: escapes in identifiers, quoted
    string fields (spaces/commas/escaped quotes), int 'i' suffix, bools,
    optional ns timestamp."""
    from opentelemetry_collector_contrib_spark.sources import influx

    rows = [
        ("cpu,host=h1,dc=east usage=0.5,idle=99i 1609459200000000000",),
        (r"disk\ io,path=/var used=1.5",),                # escaped space, no ts
        ('ev,app=web msg="hello, \\"world\\"",ok=true 5',),  # quoted string field
        ("bad_no_fields 1609459200000000000",),           # ts can't be fields
        ("m f=notanumber",),                              # bad numeric -> invalid
    ]
    df = spark.createDataFrame(rows, "line STRING")
    out = influx.parse_influx_lines(df).collect()
    valid = [r for r in out if r["valid"]]
    by_key = {(r["measurement"], r["field_key"]): r for r in valid}

    u = by_key[("cpu", "usage")]
    assert u["value"] == 0.5 and u["field_type"] == "float"
    assert u["tags"] == {"host": "h1", "dc": "east"}
    assert u["ts"] is not None
    i = by_key[("cpu", "idle")]
    assert i["value"] == 99.0 and i["field_type"] == "int"

    d = by_key[("disk io", "used")]
    assert d["value"] == 1.5 and d["ts"] is None

    m = by_key[("ev", "msg")]
    assert m["field_type"] == "string" and m["value_str"] == 'hello, "world"'
    ok = by_key[("ev", "ok")]
    assert ok["field_type"] == "bool" and ok["value"] == 1.0

    # the two malformed lines contribute no valid rows
    assert not any(r["measurement"] in ("bad_no_fields", "m") for r in valid)


def test_prometheus_text_parse(spark):
    from opentelemetry_collector_contrib_spark.sources import prometheus as prom

    lines = [
        "# HELP http_requests_total Total \\\\ requests\\n(escaped).",
        "# TYPE http_requests_total counter",
        'http_requests_total{method="post",code="200"} 1027 1395066363000',
        'http_requests_total{method="get",path="/x \\" y\\\\z",} 3',
        "# TYPE rpc_duration histogram",
        'rpc_duration_bucket{le="+Inf"} 144320',
        "rpc_duration_sum 53423.12",
        "rpc_duration_count 144320",
        "foo_sum 12.5",
        "# TYPE foo_sum gauge",
        "bad metric line!!",
        "no_value_metric",
        "minus_inf -Inf",
        "nan_metric NaN",
        "",
        "# just a comment",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    parsed = prom.parse_prometheus_text(df)
    kinds = [r["kind"] for r in parsed.collect()]
    assert kinds == (
        ["help", "type", "sample", "sample", "type"]
        + ["sample"] * 4
        + ["type", "invalid", "invalid", "sample", "sample"]
        + ["blank", "comment"]
    )
    rows = {
        (r["metric_name"], tuple(sorted((r["labels"] or {}).items()))): r
        for r in parsed.filter("kind = 'sample'").collect()
    }
    # label-value escapes \" and \\ are unescaped
    esc = rows[("http_requests_total", (("method", "get"), ("path", '/x " y\\z')))]
    assert esc["value"] == 3.0 and esc["ts"] is None
    # millisecond timestamps surface as TIMESTAMP
    stamped = rows[("http_requests_total", (("code", "200"), ("method", "post")))]
    assert stamped["ts"].year == 2014
    # +Inf / -Inf / NaN values per strconv.ParseFloat
    import math

    assert rows[("rpc_duration_bucket", (("le", "+Inf"),))]["value"] == 144320.0
    assert rows[("minus_inf", ())]["value"] == float("-inf")
    assert math.isnan(rows[("nan_metric", ())]["value"])
    # HELP docstring unescape: \\ -> \ and \n -> newline
    help_text = parsed.filter("kind = 'help'").collect()[0]["meta_text"]
    assert help_text == "Total \\ requests\n(escaped)."

    # family metadata: exact name wins over suffix stripping
    out = {r["metric_name"]: r for r in prom.attach_family_meta(parsed).collect()}
    assert out["foo_sum"]["metric_type"] == "gauge"  # NOT histogram-suffixed
    assert out["rpc_duration_sum"]["metric_type"] == "histogram"
    assert out["rpc_duration_bucket"]["metric_type"] == "histogram"
    assert out["http_requests_total"]["metric_help"].startswith("Total")
    assert out["minus_inf"]["metric_type"] is None


def test_fluentforward_decode_modes(spark):
    from opentelemetry_collector_contrib_spark.sources import fluentforward as ff

    frames = [
        ff.encode_message_event(
            "app", 1700000001, {"message": "m1", "level": "info", "n": 5}
        ),
        ff.encode_message_event(
            "fb", ff.pack_event_time(1700000002, 500000000), {"log": "m2"}
        ),
        ff.encode_forward_event("fwd", [(1, {"message": "a"}), (2, {"message": "b"})]),
        ff.encode_packed_forward_event("pf", [(7, {"log": "x"})], compress=True),
        b"\x01\x02garbage",
    ]
    df = spark.createDataFrame([(f,) for f in frames], "event binary")
    rows = ff.decode_fluentforward(df, "event").collect()
    ok = [r for r in rows if r["valid"]]
    bad = [r for r in rows if not r["valid"]]
    assert len(ok) == 5 and len(bad) == 1
    by_body = {r["body"]: r for r in ok}
    assert by_body["m1"]["tag"] == "app"
    assert by_body["m1"]["attrs"] == {"fluent.tag": "app", "level": "info", "n": "5"}
    assert by_body["m1"]["ts"].second == 21  # 1700000001 utc = 22:13:21
    # EventTime ext carries sub-second precision (timeext.go:46-53)
    assert by_body["m2"]["ts"].microsecond == 500000
    assert by_body["a"]["tag"] == "fwd" and by_body["b"]["tag"] == "fwd"
    assert by_body["x"]["tag"] == "pf"


def test_line_parsers_hostile_inputs_never_abort(spark):
    """ADVICE r2 regressions: hostile single lines must classify per-line
    (valid=false / NULL ts), never raise DUPLICATED_MAP_KEY /
    CAST_INVALID_INPUT / long-overflow and abort the whole job."""
    from opentelemetry_collector_contrib_spark.sources import (
        carbon, influx, prometheus, wavefront,
    )

    # --- duplicate tag/label keys: last occurrence wins, job survives ---
    c = carbon.parse_carbon_lines(
        spark.createDataFrame([("name;k=1;k=2 5 100",)], "line STRING")
    ).collect()[0]
    assert c["valid"] and c["tags"] == {"k": "2"}

    w = wavefront.parse_wavefront_lines(
        spark.createDataFrame([("m 1 100 source=h k=1 k=2",)], "line STRING")
    ).collect()[0]
    assert w["valid"] and w["tags"] == {"source": "h", "k": "2"}

    i = influx.parse_influx_lines(
        spark.createDataFrame([("m,k=1,k=2 f=1 100",)], "line STRING")
    ).collect()[0]
    assert i["valid"] and i["tags"] == {"k": "2"}

    p = prometheus.parse_prometheus_text(
        spark.createDataFrame([('m{k="1",k="2"} 5',)], "line STRING")
    ).collect()[0]
    assert p["kind"] == "sample" and p["labels"] == {"k": "2"}

    # --- int64-overflow prometheus timestamp: line becomes invalid ---
    p2 = prometheus.parse_prometheus_text(
        spark.createDataFrame(
            [("m 5 999999999999999999999999",), ("m 5 1700000000000",)],
            "line STRING",
        )
    ).collect()
    by = {r["kind"]: r for r in p2}
    assert "invalid" in by and by["sample"]["ts"] is not None

    # --- valid-int64 timestamps beyond Spark's µs range: NULL ts, valid ---
    c2 = carbon.parse_carbon_lines(
        spark.createDataFrame(
            [("m 5 9223372036854775807",), ("m 5 100",)], "line STRING"
        )
    ).collect()
    big = [r for r in c2 if r["ts"] is None][0]
    assert big["valid"] and len([r for r in c2 if r["valid"]]) == 2

    w2 = wavefront.parse_wavefront_lines(
        spark.createDataFrame(
            [("m 5 9223372036854775807 source=h",)], "line STRING"
        )
    ).collect()[0]
    assert w2["valid"] and w2["ts"] is None

    # --- carbon tag charset follows the code, not the doc comment:
    # plaintext_parser.go:64-69 only requires '=' at index >= 1 ---
    c3 = carbon.parse_carbon_lines(
        spark.createDataFrame([("m;a!b=c 1 1",)], "line STRING")
    ).collect()[0]
    assert c3["valid"] and c3["tags"] == {"a!b": "c"}

    # --- influx ns timestamps keep integer µs precision ---
    i2 = influx.parse_influx_lines(
        spark.createDataFrame(
            [("m f=1 1700000000123456789",)], "line STRING"
        )
    ).collect()[0]
    assert i2["valid"] and i2["ts"].microsecond == 123456


def test_influx_encoder_roundtrip_and_edge_cases(spark):
    """writer.go:70-76 strict-encoder contract: sorted tags, identifier
    and quoted-string escaping, typed field rendering, fieldless rows
    refused (NULL line); decode(encode(x)) recovers every value."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sources import influx

    df = spark.createDataFrame(
        [
            ("cpu load,1", {"host name": "h 1", "dc": "us,east", "z=k": "v\\x"},
             {"usage": 0.55}, {"count": 42}, {"note": 'say "hi"\\now'},
             {"up": True}, 1_700_000_000_123_456_789),
            # fieldless -> NULL line (encoder refuses a no-field line)
            ("mem", {"h": "x"}, {}, {}, {}, {}, 1),
        ],
        "measurement STRING, tags MAP<STRING,STRING>, ff MAP<STRING,DOUBLE>,"
        " fi MAP<STRING,LONG>, fs MAP<STRING,STRING>,"
        " fb MAP<STRING,BOOLEAN>, ts LONG",
    )
    lines = influx.to_influx_lines(
        df, "measurement", "tags", "ff", "fi", "fs", "fb", "ts"
    ).collect()
    by_null = {r["line"] is None for r in lines}
    assert by_null == {True, False}
    line = next(r["line"] for r in lines if r["line"])
    # tags sorted by key: dc < host name < z=k
    assert line.index("dc=") < line.index("host\\ name=") < line.index("z\\=k=")
    assert line.endswith(" 1700000000123456789")

    parsed = influx.parse_influx_lines(
        influx.to_influx_lines(
            df, "measurement", "tags", "ff", "fi", "fs", "fb", "ts"
        ).filter("line IS NOT NULL")
    ).collect()
    got = {
        r["field_key"]: (r["field_type"], r["value"], r["value_str"])
        for r in parsed
    }
    assert all(r["valid"] for r in parsed)
    assert all(r["measurement"] == "cpu load,1" for r in parsed)
    assert all(
        dict(r["tags"])
        == {"host name": "h 1", "dc": "us,east", "z=k": "v\\x"}
        for r in parsed
    )
    assert got["usage"] == ("float", 0.55, None)
    assert got["count"] == ("int", 42.0, None)
    assert got["note"] == ("string", None, 'say "hi"\\now')
    assert got["up"] == ("bool", 1.0, None)
