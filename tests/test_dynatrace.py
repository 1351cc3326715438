"""dynatrace serialization vs exporter/dynatraceexporter/serialization
(bug-faithful quirks included)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, MapType, StringType, StructField, StructType,
)

from opentelemetry_collector_contrib_spark.sinks import dynatrace

GAUGE = StructType([
    StructField("name", StringType()),
    StructField("labels", MapType(StringType(), StringType())),
    StructField("value", DoubleType()),
    StructField("ts_ms", LongType()),
])


def test_normalize_escape_and_float_quirks(spark):
    df = spark.range(1).select(
        dynatrace.normalize_string(F.lit("0.9My Metric!!.count__"), 250).alias("a"),
        dynatrace.normalize_string(F.lit("平仮名"), 250).alias("b"),
        dynatrace.escape_dimension(F.lit('say "hi"')).alias("c"),
        dynatrace.serialize_float(F.lit(19.5)).alias("d"),
        dynatrace.serialize_float(F.lit(0.0)).alias("e"),
        dynatrace.serialize_float(F.lit(120.0)).alias("f"),
    ).collect()[0]
    assert df.a == "My_Metric_.count"     # leading digits/dots + trailing _
    assert df.b is None                   # fully disallowed -> Go error
    assert df.c == '"say \\\\"hi\\\\""'   # quote-escape THEN backslash-double
    assert df.d == "19.5" and df.e == "0"
    assert df.f == "12"                   # TrimRight('0.') bug, bug-faithful


def test_gauge_line_and_zero_count_drop(spark):
    g = spark.createDataFrame(
        [("cpu.idle", {"Host": "web 1"}, 2.0, 1600000000000)], GAUGE)
    line = dynatrace.serialize_gauge_lines(g).collect()[0].line
    assert line == 'cpu.idle,host="web 1" 2 1600000000000'

    h = spark.createDataFrame(
        [("lat", {}, 0, 0.0, 1), ("lat", {}, 2, 39.0, 1)],
        StructType([
            StructField("name", StringType()),
            StructField("labels", MapType(StringType(), StringType())),
            StructField("count", LongType()),
            StructField("sum", DoubleType()),
            StructField("ts_ms", LongType()),
        ]))
    lines = dynatrace.serialize_histogram_lines(h).collect()
    assert len(lines) == 1                # count==0 datapoint emits nothing
    assert lines[0].line == "lat gauge,min=19.5,max=19.5,sum=39,count=2 1"
