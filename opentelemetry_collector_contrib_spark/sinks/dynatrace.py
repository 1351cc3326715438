"""dynatrace exporter analogue: datapoint rows → metric ingest lines.

Reference: exporter/dynatraceexporter/serialization/serialization.go —
  - NormalizeString (:155-173): disallowed chars → ``_``, leading digits
    and dots stripped, truncated to max, trailing ``_`` removed; empty
    result is an error (the caller skips that dimension/metric)
  - serializeTags (:124-147): lowercased+normalized keys (max 100),
    values quoted with escapeDimension (:150-152) — which replaces ``"``
    with ``\\"`` FIRST and then doubles backslashes, so a quote becomes
    ``\\\\"``; replicated bug-for-bug
  - serializeFloat64 (:175-182): fixed 6 decimals then TrimRight over the
    cutset ``0.`` — which also eats significant trailing zeros BEFORE the
    dot (120.0 → "12"); replicated bug-for-bug, cited here so nobody
    "fixes" one side only
  - serializeLine (:109-122): ``{name}[,{tags}] {value} {ts_ms}``
  - SerializeHistogramMetrics (:65-82): histograms collapse to
    ``gauge,min=<avg>,max=<avg>,sum=<sum>,count=<n>`` (min/max are the
    average — the reference has no true min/max available); count==0
    datapoints produce no line

One divergence from Go: label iteration order is map-random in the
reference; we sort tags by key so output is deterministic. Everything is
string expressions inside one projection — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_DIM_KEY_LEN = 100


def normalize_string(s: Column, max_len: int) -> Column:
    """NormalizeString; returns null where Go returns an error."""
    n = F.regexp_replace(s, "[^A-Za-z0-9.-]+", "_")
    n = F.regexp_replace(n, "^[.0-9]+", "")
    n = F.substring(n, 1, max_len)
    n = F.regexp_replace(n, "_+$", "")
    return F.when(F.length(n) > 0, n)


def escape_dimension(v: Column) -> Column:
    # reference order: quote-escape first, then double ALL backslashes
    step1 = F.replace(v, F.lit('"'), F.lit('\\"'))
    step2 = F.replace(step1, F.lit("\\"), F.lit("\\\\"))
    return F.concat(F.lit('"'), step2, F.lit('"'))


def serialize_float(n: Column) -> Column:
    s = F.regexp_replace(F.format_string("%.6f", n), "[0.]+$", "")
    return F.when(s == "", "0").otherwise(s)


def tagline(labels: Column) -> Column:
    """serializeTags over a labels map: normalized lowercase keys, escaped
    quoted values, un-normalizable keys skipped, sorted for determinism."""
    ents = F.filter(
        F.transform(
            F.map_entries(labels),
            lambda e: F.struct(
                normalize_string(F.lower(e["key"]), MAX_DIM_KEY_LEN).alias("k"),
                escape_dimension(e["value"]).alias("v"))),
        lambda t: t["k"].isNotNull())
    return F.array_join(
        F.transform(F.array_sort(ents),
                    lambda t: F.concat(t["k"], F.lit("="), t["v"])), ",")


def _line(name: Column, tags: Column, valueline: Column, ts_ms: Column) -> Column:
    head = F.when(tags != "", F.concat(name, F.lit(","), tags)).otherwise(name)
    return F.concat(head, F.lit(" "), valueline, F.lit(" "), ts_ms.cast("string"))


def serialize_gauge_lines(df: DataFrame) -> DataFrame:
    """SerializeDoubleDataPoints over rows (name, labels, value, ts_ms)."""
    return df.select(_line(F.col("name"), tagline(F.col("labels")),
                           serialize_float(F.col("value")),
                           F.col("ts_ms")).alias("line"))


def serialize_int_lines(df: DataFrame) -> DataFrame:
    """SerializeIntDataPoints: integer values render exactly."""
    return df.select(_line(F.col("name"), tagline(F.col("labels")),
                           F.col("value").cast("long").cast("string"),
                           F.col("ts_ms")).alias("line"))


def serialize_histogram_lines(df: DataFrame) -> DataFrame:
    """SerializeHistogramMetrics over rows (name, labels, count, sum,
    ts_ms); count==0 rows are dropped. The avg is pre-rounded to 4
    decimals: sum/count can land exactly on a .xxxxxx5 formatting tie,
    where Java's %.6f (HALF_UP) and C printf (half-even) disagree —
    rounding first makes the rendering engine-independent."""
    avg = serialize_float(F.round(F.col("sum") / F.col("count"), 4))
    valueline = F.concat(
        F.lit("gauge,min="), avg, F.lit(",max="), avg,
        F.lit(",sum="), serialize_float(F.col("sum")),
        F.lit(",count="), F.col("count").cast("long").cast("string"))
    return (df.filter(F.col("count") > 0)
              .select(_line(F.col("name"), tagline(F.col("labels")),
                            valueline, F.col("ts_ms")).alias("line")))
