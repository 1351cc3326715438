"""datadog exporter metrics-translation analogue.

Reference: exporter/datadogexporter/metrics_translator.go —
  - getTags (:37-48): labels → ``key:value`` tag strings, empty values
    replaced with ``n/a`` (tags cannot end with ``:``)
  - metricDimensionsToMapKey (:65-71): series identity = sorted
    (tags + name) joined by ``}{`` (characters invalid in tags)
  - mapIntMetrics / mapDoubleMetrics (:73-97): datapoints → gauges
  - mapIntMonotonicMetrics / mapDoubleMonotonicMetrics (:106-177):
    cumulative monotonic counters → per-series deltas; the first point of
    a series and negative deltas (= counter reset) are stored but NOT
    exported; out-of-order points are dropped
  - mapHistogramMetrics (:194-253): each histogram datapoint → ``.count``
    and ``.sum`` gauges, plus opt-in per-bucket ``.count_per_bucket``
    gauges tagged ``bucket_idx:N`` (bounds are ignored, matching the
    OpenCensus exporter lineage)
  - mapSummaryMetrics / getQuantileTag (:255-300): ``.count`` / ``.sum``
    plus opt-in ``.quantile`` gauges tagged ``quantile:<q>`` with the
    OpenMetrics canonical-number quirks (``quantile:0``, ``quantile:1.0``)

Spark design: a datapoint row carries ``labels MAP<STRING,STRING>``; tags
are derived with JVM map/array expressions, histogram buckets explode with
``posexplode`` (one narrow generator, no UDF), and the monotonic-delta
translator is a lag window over the series key — the same partitioning a
Datadog intake shards on, so at 10^12 points the shuffle is the minimal
per-series one and everything else is map-side. The TTL'd prev-point map
the Go code needs for streaming state is exactly what the window provides
in batch; ocs/streaming/stateful.py holds the streaming analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tag_array(labels: Column) -> Column:
    """getTags: ``k:v`` with empty values → ``n/a``; sorted so downstream
    renderings are deterministic (Go map iteration order is random — the
    reference sorts inside metricDimensionsToMapKey instead)."""
    return F.array_sort(F.transform(
        F.map_entries(labels),
        lambda e: F.concat(
            e["key"], F.lit(":"),
            F.when(e["value"] == "", "n/a").otherwise(e["value"])),
    ))


def series_key(name: Column, tags: Column) -> Column:
    """metricDimensionsToMapKey: sorted (tags + name) joined by '}{'."""
    return F.array_join(F.array_sort(F.concat(tags, F.array(name))), "}{")


def map_gauges(df: DataFrame) -> DataFrame:
    """mapIntMetrics/mapDoubleMetrics: (name, labels, ts, value) → gauges."""
    return df.select(
        F.col("name").alias("metric"),
        tag_array(F.col("labels")).alias("tags"),
        F.lit("gauge").alias("metric_type"),
        "ts",
        F.col("value").cast("double").alias("value"),
    )


def map_monotonic(df: DataFrame) -> DataFrame:
    """mapIntMonotonicMetrics/mapDoubleMonotonicMetrics: cumulative
    monotonic series → 'count' deltas. First point per series and
    negative deltas (counter resets) are suppressed; ordering is by ts
    within the series key, which in batch subsumes the reference's
    drop-out-of-order rule."""
    tags = tag_array(F.col("labels"))
    w = Window.partitionBy(series_key(F.col("name"), tags)).orderBy("ts")
    dx = F.col("value").cast("double") - F.lag(F.col("value").cast("double")).over(w)
    return (df
            .withColumn("__dx", dx)
            .filter(F.col("__dx").isNotNull() & (F.col("__dx") >= 0))
            .select(F.col("name").alias("metric"), tags.alias("tags"),
                    F.lit("count").alias("metric_type"), "ts",
                    F.col("__dx").alias("value")))


def map_histograms(df: DataFrame, buckets: bool = False) -> DataFrame:
    """mapHistogramMetrics: (name, labels, ts, count, sum, bucket_counts
    array<long>) → .count/.sum gauges (+ per-bucket gauges tagged
    bucket_idx:N when ``buckets``); bucket bounds are ignored."""
    tags = tag_array(F.col("labels"))
    base = df.select(
        F.col("name"), tags.alias("tags"), "ts",
        F.col("count").cast("double").alias("count"),
        F.col("sum").cast("double").alias("sum"),
        "bucket_counts",
    )
    cnt = base.select(
        F.concat("name", F.lit(".count")).alias("metric"), "tags",
        F.lit("gauge").alias("metric_type"), "ts", F.col("count").alias("value"))
    sm = base.select(
        F.concat("name", F.lit(".sum")).alias("metric"), "tags",
        F.lit("gauge").alias("metric_type"), "ts", F.col("sum").alias("value"))
    out = cnt.unionByName(sm)
    if buckets:
        per = (base
               .select("name", "tags", "ts",
                       F.posexplode("bucket_counts").alias("idx", "bucket_count"))
               .select(
                   F.concat("name", F.lit(".count_per_bucket")).alias("metric"),
                   F.array_sort(F.concat(
                       F.col("tags"),
                       F.array(F.concat(F.lit("bucket_idx:"), F.col("idx"))),
                   )).alias("tags"),
                   F.lit("gauge").alias("metric_type"), "ts",
                   F.col("bucket_count").cast("double").alias("value")))
        out = out.unionByName(per)
    return out


def quantile_tag(q: Column) -> Column:
    """getQuantileTag: 0 → 'quantile:0', 1 → 'quantile:1.0', else the
    shortest decimal rendering (canonical for the plain decimals summaries
    carry in practice)."""
    body = (F.when(q == 0, F.lit("0"))
             .when(q == 1.0, F.lit("1.0"))
             .otherwise(F.regexp_replace(q.cast("string"), r"\.?0+$", "")))
    return F.concat(F.lit("quantile:"), body)


def map_summaries(df: DataFrame, quantiles: bool = False) -> DataFrame:
    """mapSummaryMetrics: (name, labels, ts, count, sum, quantile_values
    array<struct<quantile double, value double>>) → .count/.sum gauges
    (+ quantile-tagged .quantile gauges when ``quantiles``)."""
    tags = tag_array(F.col("labels"))
    base = df.select(
        F.col("name"), tags.alias("tags"), "ts",
        F.col("count").cast("double").alias("count"),
        F.col("sum").cast("double").alias("sum"),
        "quantile_values",
    )
    cnt = base.select(
        F.concat("name", F.lit(".count")).alias("metric"), "tags",
        F.lit("gauge").alias("metric_type"), "ts", F.col("count").alias("value"))
    sm = base.select(
        F.concat("name", F.lit(".sum")).alias("metric"), "tags",
        F.lit("gauge").alias("metric_type"), "ts", F.col("sum").alias("value"))
    out = cnt.unionByName(sm)
    if quantiles:
        per = (base
               .select("name", "tags", "ts",
                       F.explode("quantile_values").alias("qv"))
               .select(
                   F.concat("name", F.lit(".quantile")).alias("metric"),
                   F.array_sort(F.concat(
                       F.col("tags"),
                       F.array(quantile_tag(F.col("qv.quantile"))),
                   )).alias("tags"),
                   F.lit("gauge").alias("metric_type"), "ts",
                   F.col("qv.value").alias("value")))
        out = out.unionByName(per)
    return out


def render_tags(df: DataFrame, out_col: str = "tags_str") -> DataFrame:
    """Comma-joined sorted tags, for oracles and JSON payload bodies."""
    return df.withColumn(out_col, F.array_join("tags", ","))
