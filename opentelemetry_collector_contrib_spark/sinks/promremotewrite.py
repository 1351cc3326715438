"""awsprometheusremotewrite exporter analogue — metrics → remote-write
time series.

Reference: exporter/awsprometheusremotewriteexporter.  In the reference
snapshot the contrib package is the SigV4 TRANSPORT wrapper
(factory.go:38-73 delegates every mapping decision to the core
prometheusremotewrite exporter via ``prw.NewFactory()``; auth.go signs
the HTTP request).  The row semantics this module re-expresses are the
ones the wrapped exporter applies, as the package README documents them
(README.md "the exporter checks the temporality and the type of each
incoming metric and only exports the following combination"):

  - admission gate: int64/double gauges with ANY temporality; monotonic
    sums, histograms and summaries with CUMULATIVE temporality only —
    every other combination is refused;
  - ``namespace`` config prefixes every exported metric name;
  - prometheus naming: metric names and label keys sanitized to
    ``[letter digit : _]`` with every other rune replaced by ``_``; a
    digit-first result is prefixed ``key_`` and an underscore-first
    result is prefixed ``key`` (the classic collector sanitize ladder);
  - the metric name travels as the ``__name__`` label of its series;
    label collisions after sanitization are last-wins;
  - samples carry (double value, millisecond timestamp); a series is
    identified by its full label set;
  - histograms fan out to cumulative ``_bucket`` series per ``le`` bound
    plus ``+Inf``, ``_sum`` and ``_count``; summaries fan out to one
    series per quantile plus ``_sum`` and ``_count``.

Spark design: sanitization is a codegen'd regexp ladder (Java regex
``\\p{L}\\p{Nd}`` matches the same unicode letter/digit classes Go's
``unicode.IsLetter/IsDigit`` use); the per-type fan-outs are explode
projections; series assembly is ONE groupBy on the canonical label-set
key — the natural remote-write shuffle, map-side combinable because
samples concatenate.  No Python in any path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.maputil import (
    map_from_entries_last_wins,
)

_SAMPLE_T = "array<struct<value:double,ts_ms:bigint>>"


def sanitize(col: Column) -> Column:
    """The collector sanitize ladder: every rune that is not a unicode
    letter/digit, ``:`` or ``_`` becomes ``_``; digit-first gains a
    ``key_`` prefix, underscore-first gains a ``key`` prefix."""
    s = F.regexp_replace(col, r"[^\p{L}\p{Nd}:_]", "_")
    return (
        F.when(s == "", s)
        .when(s.rlike(r"^\p{Nd}"), F.concat(F.lit("key_"), s))
        .when(s.startswith("_"), F.concat(F.lit("key"), s))
        .otherwise(s)
    )


def prom_name(name: Column, namespace: str = "") -> Column:
    """Exported metric name: optional namespace prefix, then sanitize."""
    if namespace:
        return sanitize(F.concat(F.lit(namespace + "_"), name))
    return sanitize(name)


def admitted(mtype: Column, temporality: Column) -> Column:
    """README admission gate: gauges always; monotonic sums / histograms
    / summaries only when CUMULATIVE."""
    return F.when(mtype == "gauge", F.lit(True)).otherwise(
        mtype.isin("monotonic_sum", "histogram", "summary")
        & (temporality == "CUMULATIVE")
    )


def _label_str(labels: Column, name: Column) -> Column:
    """Canonical series key: sanitized label keys (last-wins on
    collisions) + the ``__name__`` label, sorted, ``k=v`` comma-joined."""
    entries = F.concat(
        F.transform(
            F.map_entries(
                F.coalesce(labels, F.create_map().cast("map<string,string>"))
            ),
            lambda e: F.struct(
                sanitize(e["key"]).alias("key"), e["value"].alias("value")
            ),
        ),
        F.array(F.struct(
            F.lit("__name__").alias("key"), name.alias("value")
        )),
    )
    m = map_from_entries_last_wins(entries)
    return F.concat_ws(",", F.array_sort(F.transform(
        F.map_entries(m),
        lambda e: F.concat(e["key"], F.lit("="), e["value"]),
    )))


def scalar_points(df: DataFrame, namespace: str = "") -> DataFrame:
    """Gauge / monotonic-sum datapoints → one sample row per point.

    Input: name, labels map<string,string>, value double, ts_ns long,
    mtype ('gauge'|'monotonic_sum'), temporality.  Refused points are
    flagged, not silently dropped (pipeline-metrics discipline)."""
    name = prom_name(F.col("name"), namespace)
    return df.select(
        name.alias("metric"),
        _label_str(F.col("labels"), name).alias("series"),
        F.col("value").cast("double").alias("value"),
        F.floor(F.col("ts_ns") / 1000000).cast("long").alias("ts_ms"),
        admitted(F.col("mtype"), F.col("temporality")).alias("ok"),
    )


def histogram_points(df: DataFrame, namespace: str = "") -> DataFrame:
    """Explicit-bounds histogram points → cumulative ``_bucket`` rows per
    ``le`` bound + ``+Inf`` + ``_sum`` + ``_count``.

    Input: name, labels, bounds array<double>, bucket_counts array<long>
    (len = len(bounds)+1, per-bucket), sum double, count long, ts_ns,
    temporality."""
    base = prom_name(F.col("name"), namespace)
    ts_ms = F.floor(F.col("ts_ns") / 1000000).cast("long")
    ok = admitted(F.lit("histogram"), F.col("temporality"))

    idx = F.sequence(F.lit(0), F.size("bounds"))        # 0..n (n = +Inf slot)
    cum = F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(F.col("bucket_counts"), F.lit(1), i + 1),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        ),
    )
    le = F.transform(
        idx,
        lambda i: F.when(
            i < F.size("bounds"),
            F.element_at(F.col("bounds"), (i + 1).cast("int")).cast("string"),
        ).otherwise("+Inf"),
    )
    buckets = df.select(
        F.col("labels"), ts_ms.alias("ts_ms"), ok.alias("ok"),
        F.concat(base, F.lit("_bucket")).alias("metric"),
        F.explode(F.zip_with(
            le, cum,
            lambda a, b: F.struct(a.alias("le"), b.alias("cum")),
        )).alias("b"),
    ).select(
        "metric",
        _label_str(
            F.map_concat(
                F.coalesce(F.col("labels"),
                           F.create_map().cast("map<string,string>")),
                F.create_map(F.lit("le"), F.col("b")["le"]),
            ),
            F.col("metric"),
        ).alias("series"),
        F.col("b")["cum"].cast("double").alias("value"),
        "ts_ms", "ok",
    )

    def _suffix(suffix, value):
        m = F.concat(base, F.lit(suffix))
        return df.select(
            m.alias("metric"),
            _label_str(F.col("labels"), m).alias("series"),
            value.cast("double").alias("value"),
            ts_ms.alias("ts_ms"),
            ok.alias("ok"),
        )

    return buckets.unionByName(
        _suffix("_sum", F.col("sum"))
    ).unionByName(_suffix("_count", F.col("count")))


def summary_points(df: DataFrame, namespace: str = "") -> DataFrame:
    """Summary points → one series per quantile + ``_sum`` + ``_count``.

    Input: name, labels, quantiles array<struct<q:double,v:double>>,
    sum double, count long, ts_ns, temporality."""
    base = prom_name(F.col("name"), namespace)
    ts_ms = F.floor(F.col("ts_ns") / 1000000).cast("long")
    ok = admitted(F.lit("summary"), F.col("temporality"))

    q_rows = df.select(
        F.col("labels"), ts_ms.alias("ts_ms"), ok.alias("ok"),
        base.alias("metric"),
        F.explode("quantiles").alias("qt"),
    ).select(
        "metric",
        _label_str(
            F.map_concat(
                F.coalesce(F.col("labels"),
                           F.create_map().cast("map<string,string>")),
                F.create_map(
                    F.lit("quantile"), F.col("qt")["q"].cast("string")
                ),
            ),
            F.col("metric"),
        ).alias("series"),
        F.col("qt")["v"].cast("double").alias("value"),
        "ts_ms", "ok",
    )

    def _suffix(suffix, value):
        m = F.concat(base, F.lit(suffix))
        return df.select(
            m.alias("metric"),
            _label_str(F.col("labels"), m).alias("series"),
            value.cast("double").alias("value"),
            ts_ms.alias("ts_ms"),
            ok.alias("ok"),
        )

    return q_rows.unionByName(
        _suffix("_sum", F.col("sum"))
    ).unionByName(_suffix("_count", F.col("count")))


def remote_write_series(points: DataFrame) -> DataFrame:
    """Assemble admitted sample rows into one row per TimeSeries: the
    canonical label set plus its time-ordered samples.  One groupBy on
    the series key — map-side combinable (collect_list partials merge),
    and the 10^12-sample corpus shuffles only (series, value, ts) pairs."""
    return (
        points.filter(F.col("ok"))
        .groupBy("series")
        .agg(
            F.sort_array(F.collect_list(F.struct(
                F.col("ts_ms").alias("ts_ms"), F.col("value").alias("value")
            ))).alias("samples"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
