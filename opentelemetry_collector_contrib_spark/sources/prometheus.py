"""Prometheus text-exposition-format parser.

Reference: receiver/simpleprometheusreceiver/receiver.go:77-130 and
receiver/prometheusexecreceiver (both scrape endpoints serving the public
Prometheus text exposition format — see the testdata at
receiver/prometheusexecreceiver/testdata/metrics:1-3 for the
``# HELP`` / ``# TYPE`` / sample shape). The Go receivers delegate the
actual text parsing to the upstream Prometheus scrape library; this module
re-expresses that grammar directly as JVM-side Spark expressions:

  line      := comment | sample | blank
  comment   := '# HELP <name> <docstring>' | '# TYPE <name> <type>' | '# ...'
  sample    := name ['{' label ("," label)* [','] '}'] ' ' value [' ' ts_ms]
  label     := label_name '=' '"' escaped_value '"'

Escapes inside label values (and HELP docstrings) are exactly ``\\\\``,
``\\"`` and ``\\n``; values are float64 including ``+Inf``/``-Inf``/``NaN``;
the optional trailing timestamp is **milliseconds** since epoch.

``# TYPE``/``# HELP`` metadata applies to a metric *family*; histogram and
summary samples carry the family name plus a ``_bucket``/``_sum``/``_count``
suffix. In a stream the association is positional (metadata precedes its
samples); in a distributed batch table order is not available, so
``attach_family_meta`` re-derives it relationally: exact-name match first
(so a gauge literally named ``foo_sum`` keeps its own metadata), then the
suffix-stripped family name. Both joins broadcast the (tiny) metadata side
— the sample table never shuffles.

All parsing is whole-column regex/higher-order functions: one codegen'd
map stage, no Python, same scale posture as sources/carbon.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.maputil import (
    map_from_arrays_last_wins,
)

# |milliseconds| representable in Spark's int64-microsecond timestamps
_TS_MS_MAX = 9_223_372_036_854_775

_NAME = r"[a-zA-Z_:][a-zA-Z0-9_:]*"
_LABEL_NAME = r"[a-zA-Z_][a-zA-Z0-9_]*"
# one label token: name="value-with-escapes"
_LABEL_TOKEN = rf'({_LABEL_NAME})="((?:[^"\\]|\\.)*)"'
# full sample line: name, optional {labels}, value, optional ms timestamp
_SAMPLE_RE = rf"^({_NAME})(?:\{{(.*)\}})?[ \t]+(\S+)(?:[ \t]+(-?\d+))?[ \t]*$"
# the label region must be fully consumed by label tokens (trailing comma ok)
_LABELS_FULL = rf"^(?:{_LABEL_TOKEN})(?:,(?:{_LABEL_TOKEN}))*,?$"

# Spark regexp_replace cannot do conditional (single-pass) unescaping, so
# route '\\\\' through a sentinel byte that cannot appear in the text format
# (it is line-oriented ASCII-safe): '\\\\' -> \x01, then '\\"' and '\\n',
# then \x01 -> '\\'.
_SENTINEL = ""


def _unescape(col):
    col = F.regexp_replace(col, r"\\\\", _SENTINEL)
    col = F.regexp_replace(col, r'\\"', '"')
    col = F.regexp_replace(col, r"\\n", "\n")
    return F.regexp_replace(col, _SENTINEL, r"\\")


def _parse_value(s):
    """Float64 per Go strconv.ParseFloat: accepts inf/infinity/nan in any
    case with optional sign; Spark's native string->double cast covers the
    plain-number and 'Infinity'/'NaN' spellings."""
    return (
        F.when(s.rlike(r"^[+]?(?i)(inf|infinity)$"), F.lit(float("inf")))
        .when(s.rlike(r"^-(?i)(inf|infinity)$"), F.lit(float("-inf")))
        .when(s.rlike(r"^[+-]?(?i)nan$"), F.lit(float("nan")))
        .otherwise(s.try_cast("double"))
    )


def parse_prometheus_text(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Classify + parse exposition lines.

    Output columns:
      kind         'sample' | 'help' | 'type' | 'comment' | 'blank' | 'invalid'
      metric_name  sample or metadata subject name
      labels       MAP<STRING,STRING> (samples; unescaped values)
      value        DOUBLE (samples; +/-Inf and NaN pass through)
      ts           TIMESTAMP from the optional millisecond stamp, else NULL
      meta_text    TYPE's type keyword, or HELP's unescaped docstring
    """
    line = F.coalesce(F.col(line_col), F.lit(""))

    is_blank = line.rlike(r"^[ \t]*$")
    help_name = F.regexp_extract(line, rf"^# HELP ({_NAME}) ?(.*)$", 1)
    help_text = F.regexp_extract(line, rf"^# HELP ({_NAME}) ?(.*)$", 2)
    type_name = F.regexp_extract(line, rf"^# TYPE ({_NAME}) (\S+)[ \t]*$", 1)
    type_kw = F.regexp_extract(line, rf"^# TYPE ({_NAME}) (\S+)[ \t]*$", 2)
    is_comment = line.startswith("#")

    s_name = F.regexp_extract(line, _SAMPLE_RE, 1)
    s_labels = F.regexp_extract(line, _SAMPLE_RE, 2)
    s_value = F.regexp_extract(line, _SAMPLE_RE, 3)
    s_ts = F.regexp_extract(line, _SAMPLE_RE, 4)

    value = _parse_value(s_value)
    labels_ok = (s_labels == "") | s_labels.rlike(_LABELS_FULL)
    # the timestamp token is digits by regex but may overflow int64
    # (strconv.ParseInt would reject it and the scrape library drops the
    # line) — try_cast + validity flag instead of a plain cast, which
    # would raise CAST_INVALID_INPUT under ANSI mode and abort the job
    ts_ms = s_ts.try_cast("long")
    ts_ok = (s_ts == "") | ts_ms.isNotNull()
    sample_ok = (s_name != "") & value.isNotNull() & labels_ok & ts_ok

    tokens = F.regexp_extract_all(s_labels, F.lit(f"({_LABEL_TOKEN})"), 1)
    # last-wins on duplicate label names; never throws under
    # mapKeyDedupPolicy=EXCEPTION
    labels = map_from_arrays_last_wins(
        F.transform(tokens, lambda t: F.regexp_extract(t, _LABEL_TOKEN, 1)),
        F.transform(
            tokens, lambda t: _unescape(F.regexp_extract(t, _LABEL_TOKEN, 2))
        ),
    )

    kind = (
        F.when(is_blank, F.lit("blank"))
        .when(help_name != "", F.lit("help"))
        .when(type_name != "", F.lit("type"))
        .when(is_comment, F.lit("comment"))
        .when(sample_ok, F.lit("sample"))
        .otherwise(F.lit("invalid"))
    )
    metric_name = (
        F.when(help_name != "", help_name)
        .when(type_name != "", type_name)
        .when(sample_ok, s_name)
    )
    return df.select(
        kind.alias("kind"),
        metric_name.alias("metric_name"),
        F.when(sample_ok, labels).alias("labels"),
        F.when(sample_ok, value).alias("value"),
        F.when(
            sample_ok
            & (s_ts != "")
            & ts_ms.between(-_TS_MS_MAX, _TS_MS_MAX),
            F.timestamp_millis(ts_ms),
        ).alias("ts"),
        F.when(help_name != "", _unescape(help_text))
        .when(type_name != "", type_kw)
        .alias("meta_text"),
    )


_FAMILY_SUFFIX = r"_(bucket|sum|count)$"


def attach_family_meta(parsed: DataFrame) -> DataFrame:
    """Join samples to their family's # TYPE / # HELP metadata.

    Exact-name metadata wins; otherwise the ``_bucket``/``_sum``/``_count``
    suffix is stripped and the family name is tried (the classic-format
    histogram/summary convention). Metadata is deduplicated per name
    (first wins is meaningless without order, so max() — exposition format
    forbids conflicting metadata for one name anyway) and broadcast.
    """
    samples = parsed.filter(F.col("kind") == "sample").drop("meta_text")
    meta = (
        parsed.filter(F.col("kind").isin("type", "help"))
        .groupBy("metric_name")
        .agg(
            F.max(F.when(F.col("kind") == "type", F.col("meta_text"))).alias(
                "metric_type"
            ),
            F.max(F.when(F.col("kind") == "help", F.col("meta_text"))).alias(
                "metric_help"
            ),
        )
    )
    exact = samples.join(
        F.broadcast(meta), on="metric_name", how="left"
    )
    fam_meta = meta.select(
        F.col("metric_name").alias("__family"),
        F.col("metric_type").alias("__fam_type"),
        F.col("metric_help").alias("__fam_help"),
    )
    out = (
        exact.withColumn(
            "__family", F.regexp_replace("metric_name", _FAMILY_SUFFIX, "")
        )
        .join(F.broadcast(fam_meta), on="__family", how="left")
        .select(
            "metric_name",
            "labels",
            "value",
            "ts",
            F.coalesce("metric_type", "__fam_type").alias("metric_type"),
            F.coalesce("metric_help", "__fam_help").alias("metric_help"),
        )
    )
    return out
