"""awsprometheusremotewrite exporter — admission gate, sanitize ladder,
series fan-out.  Reference: exporter/awsprometheusremotewriteexporter
(factory.go wraps the core prometheusremotewrite exporter; README.md
documents the admitted type/temporality combinations and namespace)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, MapType, StringType, StructField,
    StructType,
)

from opentelemetry_collector_contrib_spark.sinks import promremotewrite as prw

SCALAR_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("labels", MapType(StringType(), StringType())),
    StructField("value", DoubleType()),
    StructField("ts_ns", LongType()),
    StructField("mtype", StringType()),
    StructField("temporality", StringType()),
])


def _scalar(spark, rows):
    return prw.scalar_points(spark.createDataFrame(rows, SCALAR_SCHEMA))


def test_sanitize_ladder(spark):
    df = spark.createDataFrame(
        [("a.b/c",), ("1foo",), ("_bar",), ("__baz",), ("ok:name_2",), ("",)],
        "s string")
    got = [r.o for r in df.select(prw.sanitize(F.col("s")).alias("o")).collect()]
    assert got == ["a_b_c", "key_1foo", "key_bar", "key__baz", "ok:name_2", ""]


def test_admission_gate(spark):
    rows = [
        ("g", {}, 1.0, 10**9, "gauge", "DELTA"),             # gauges: any
        ("m", {}, 1.0, 10**9, "monotonic_sum", "CUMULATIVE"),
        ("m2", {}, 1.0, 10**9, "monotonic_sum", "DELTA"),    # refused
    ]
    got = {r.metric: r.ok for r in _scalar(spark, rows).collect()}
    assert got == {"g": True, "m": True, "m2": False}


def test_series_key_and_ms_timestamp(spark):
    rows = [("http.requests", {"a.b": "x", "c": "y"}, 2.5, 1_500_000_000,
             "gauge", "CUMULATIVE")]
    r = _scalar(spark, rows).collect()[0]
    assert r.metric == "http_requests"
    assert r.series == "__name__=http_requests,a_b=x,c=y"
    assert (r.value, r.ts_ms) == (2.5, 1500)


def test_label_collision_after_sanitize_last_wins(spark):
    # 'a.b' and 'a_b' collide post-sanitize; map-entry order puts the
    # later (Go map overwrite) last — last occurrence wins
    rows = [("n", {"a.b": "first", "a_b": "second"}, 1.0, 0,
             "gauge", "CUMULATIVE")]
    r = _scalar(spark, rows).collect()[0]
    assert r.series == "__name__=n,a_b=second"


def test_namespace_prefix(spark):
    df = spark.createDataFrame(
        [("req.count", {}, 1.0, 0, "gauge", "CUMULATIVE")], SCALAR_SCHEMA)
    r = prw.scalar_points(df, namespace="ns1").collect()[0]
    assert r.metric == "ns1_req_count"


HIST_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("labels", MapType(StringType(), StringType())),
    StructField("bounds", ArrayType(DoubleType())),
    StructField("bucket_counts", ArrayType(LongType())),
    StructField("sum", DoubleType()),
    StructField("count", LongType()),
    StructField("ts_ns", LongType()),
    StructField("temporality", StringType()),
])


def test_histogram_fanout_cumulative_le(spark):
    df = spark.createDataFrame(
        [("lat", {"h": "a"}, [0.0, 10.0], [1, 2, 3], 42.5, 6,
          2_000_000_000, "CUMULATIVE")], HIST_SCHEMA)
    rows = prw.histogram_points(df).collect()
    got = {(r.metric, r.series): r.value for r in rows}
    assert got[("lat_bucket", "__name__=lat_bucket,h=a,le=0.0")] == 1.0
    assert got[("lat_bucket", "__name__=lat_bucket,h=a,le=10.0")] == 3.0
    assert got[("lat_bucket", "__name__=lat_bucket,h=a,le=+Inf")] == 6.0
    assert got[("lat_sum", "__name__=lat_sum,h=a")] == 42.5
    assert got[("lat_count", "__name__=lat_count,h=a")] == 6.0
    assert all(r.ok for r in rows) and all(r.ts_ms == 2000 for r in rows)
    # DELTA histogram refused on every fanned-out row
    ddf = spark.createDataFrame(
        [("lat", {}, [0.0], [1, 2], 1.0, 3, 0, "DELTA")], HIST_SCHEMA)
    assert all(not r.ok for r in prw.histogram_points(ddf).collect())


SUMMARY_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("labels", MapType(StringType(), StringType())),
    StructField("quantiles", ArrayType(StructType([
        StructField("q", DoubleType()), StructField("v", DoubleType())]))),
    StructField("sum", DoubleType()),
    StructField("count", LongType()),
    StructField("ts_ns", LongType()),
    StructField("temporality", StringType()),
])


def test_summary_fanout(spark):
    df = spark.createDataFrame(
        [("rt", {}, [(0.5, 1.5), (0.99, 9.9)], 100.0, 7, 0, "CUMULATIVE")],
        SUMMARY_SCHEMA)
    rows = prw.summary_points(df).collect()
    got = {r.series: r.value for r in rows}
    assert got["__name__=rt,quantile=0.5"] == 1.5
    assert got["__name__=rt,quantile=0.99"] == 9.9
    assert got["__name__=rt_sum"] == 100.0
    assert got["__name__=rt_count"] == 7.0


def test_remote_write_series_assembly(spark):
    rows = [
        ("g", {"k": "v"}, 2.0, 2 * 10**9, "gauge", "CUMULATIVE"),
        ("g", {"k": "v"}, 1.0, 1 * 10**9, "gauge", "CUMULATIVE"),
        ("g", {"k": "w"}, 3.0, 1 * 10**9, "gauge", "CUMULATIVE"),
        ("g", {"k": "v"}, 9.0, 3 * 10**9, "monotonic_sum", "DELTA"),  # refused
    ]
    out = {r.series: r for r in prw.remote_write_series(
        _scalar(spark, rows)).collect()}
    kv = out["__name__=g,k=v"]
    assert kv.n_samples == 2
    assert [(s.ts_ms, s.value) for s in kv.samples] == [(1000, 1.0), (2000, 2.0)]
    assert out["__name__=g,k=w"].n_samples == 1
