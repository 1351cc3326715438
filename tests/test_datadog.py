"""datadog metrics translation vs exporter/datadogexporter/
metrics_translator.go semantics (hand-derived from the mapper functions)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, MapType, StringType, StructField,
    StructType,
)

from opentelemetry_collector_contrib_spark.sinks import datadog

MONO_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("labels", MapType(StringType(), StringType())),
    StructField("ts", LongType()),
    StructField("value", LongType()),
])


def test_tags_empty_value_and_series_key(spark):
    df = spark.createDataFrame(
        [("m", {"b": "", "a": "x"}, 0, 1)], MONO_SCHEMA)
    row = df.select(
        datadog.tag_array(F.col("labels")).alias("tags")).collect()[0]
    assert row.tags == ["a:x", "b:n/a"]       # getTags: '' -> 'n/a'
    key = df.select(datadog.series_key(
        F.col("name"), datadog.tag_array(F.col("labels"))).alias("k")).collect()[0].k
    assert key == "a:x}{b:n/a}{m"             # sorted, '}{' joined


def test_monotonic_first_point_and_reset_suppressed(spark):
    df = spark.createDataFrame([
        ("c", {"h": "a"}, 1, 100),
        ("c", {"h": "a"}, 2, 130),    # dx 30
        ("c", {"h": "a"}, 3, 20),     # reset: dx < 0 -> suppressed
        ("c", {"h": "a"}, 4, 50),     # dx 30 vs the stored reset point
        ("c", {"h": "b"}, 1, 7),      # lone first point -> nothing
    ], MONO_SCHEMA)
    out = datadog.map_monotonic(df).collect()
    got = sorted((r.ts, r.value, r.metric_type) for r in out)
    assert got == [(2, 30.0, "count"), (4, 30.0, "count")]


def test_histogram_buckets_and_summary_quantile_tags(spark):
    hist = spark.createDataFrame(
        [("lat", {"svc": "web"}, 5, 3, 60.0, [2, 1])],
        StructType([
            StructField("name", StringType()),
            StructField("labels", MapType(StringType(), StringType())),
            StructField("ts", LongType()),
            StructField("count", LongType()),
            StructField("sum", DoubleType()),
            StructField("bucket_counts", ArrayType(LongType())),
        ]))
    rows = datadog.map_histograms(hist, buckets=True).collect()
    got = sorted((r.metric, tuple(r.tags), r.value) for r in rows)
    assert got == [
        ("lat.count", ("svc:web",), 3.0),
        ("lat.count_per_bucket", ("bucket_idx:0", "svc:web"), 2.0),
        ("lat.count_per_bucket", ("bucket_idx:1", "svc:web"), 1.0),
        ("lat.sum", ("svc:web",), 60.0),
    ]

    summ = spark.createDataFrame(
        [("rt", {"svc": "web"}, 0, 4, 10.0,
          [(0.0, 1.0), (0.5, 2.0), (0.99, 3.0), (1.0, 4.0)])],
        StructType([
            StructField("name", StringType()),
            StructField("labels", MapType(StringType(), StringType())),
            StructField("ts", LongType()),
            StructField("count", LongType()),
            StructField("sum", DoubleType()),
            StructField("quantile_values", ArrayType(StructType([
                StructField("quantile", DoubleType()),
                StructField("value", DoubleType()),
            ]))),
        ]))
    qrows = datadog.map_summaries(summ, quantiles=True).collect()
    qtags = sorted(r.tags[0] for r in qrows if r.metric == "rt.quantile")
    # getQuantileTag: 0 -> 'quantile:0', 1 -> 'quantile:1.0', rest shortest
    assert qtags == ["quantile:0", "quantile:0.5", "quantile:0.99", "quantile:1.0"]
