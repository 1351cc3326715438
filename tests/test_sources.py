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
