"""New Relic exporter analogue: spans/logs → flat telemetry attribute maps.

Reference: exporter/newrelicexporter/transformer.go —
  - CommonAttributes (:68-85): resource attrs + instrumentation.name /
    instrumentation.version (omitted when empty) + the OVERRIDE attrs
    collector.name / collector.version, which always win;
  - Span (:91-119): telemetry.Span{id, trace.id, parent, name, timestamp,
    duration, attributes} — invalid (empty) span/trace ids error out;
  - SpanAttributes (:169-230): otel.status_code (STATUS_CODE_ prefix
    trimmed, only when set), otel.status_description (only with a
    message), span.kind (SPAN_KIND_ prefix trimmed, lowercased, only when
    specified), otel.dropped_attributes_count / otel.dropped_events_count
    (only when > 0), then the span's own attributes EXCEPT override keys;
  - Log (:121-167): message = body string, else the record name; attrs =
    log attrs (minus overrides) + name + trace.id/span.id when non-empty +
    log.level / log.levelNum when set.

Spark design: every rule is a ``when``-guarded map entry — one
codegen'd projection, no UDF, no shuffle; the flat attribute map feeds
write_fanout like the other exporter translators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OVERRIDE_KEYS = ("collector.name", "collector.version")


def _entry(key: str, value: Column, cond: Column | None = None):
    """Optional map entry: NULL key rows are filtered out before
    map_from_entries."""
    e = F.struct(F.lit(key).alias("key"), value.cast("string").alias("value"))
    return e if cond is None else F.when(cond, e)


def _build_map(entries: list[Column]) -> Column:
    return F.map_from_entries(
        F.filter(F.array(*entries), lambda e: e.isNotNull())
    )


def newrelic_spans(
    df: DataFrame,
    collector_name: str = "otelcol",
    collector_version: str = "",
    attrs_col: str = "attrs",
    resource_col: str = "resource",
) -> DataFrame:
    """Span rows → (span_id, trace_id, parent_id, name, timestamp_ms,
    duration_ms, attributes, common_attributes, valid).

    ``attributes`` follows SpanAttributes exactly; ``common_attributes``
    is CommonAttributes (resource + instrumentation + overrides, overrides
    last-wins).  ``valid`` mirrors errInvalidSpanID/errInvalidTraceID.
    """
    status = F.col("status_code")
    kind = F.col("kind")
    span_entries = [
        _entry(
            "otel.status_code",
            F.regexp_replace(status, "^STATUS_CODE_", ""),
            status != "STATUS_CODE_UNSET",
        ),
        _entry(
            "otel.status_description",
            F.col("status_message"),
            (status != "STATUS_CODE_UNSET") & (F.col("status_message") != ""),
        ),
        _entry(
            "span.kind",
            F.lower(F.regexp_replace(kind, "^SPAN_KIND_", "")),
            kind != "SPAN_KIND_UNSPECIFIED",
        ),
        _entry(
            "otel.dropped_attributes_count",
            F.col("dropped_attributes_count"),
            F.col("dropped_attributes_count") > 0,
        ),
        _entry(
            "otel.dropped_events_count",
            F.col("dropped_events_count"),
            F.col("dropped_events_count") > 0,
        ),
    ]
    base = _build_map(span_entries)
    own = F.map_filter(
        F.col(attrs_col),
        lambda k, _v: ~k.isin(*[F.lit(x) for x in OVERRIDE_KEYS]),
    )
    # transformer.go SpanAttributes writes the span's OWN attributes into
    # the Go map LAST, so an own attr named otel.status_code / span.kind /
    # ... overwrites the computed entry.  Mirror that write order: drop
    # colliding computed entries and let the own attr win.
    attributes = F.map_from_entries(
        F.concat(
            F.filter(
                F.map_entries(base),
                lambda e: ~F.array_contains(F.map_keys(own), e["key"]),
            ),
            F.map_entries(own),
        )
    )

    override_entries = [_entry("collector.name", F.lit(collector_name))]
    if collector_version:
        override_entries.append(
            _entry("collector.version", F.lit(collector_version))
        )
    overrides = _build_map(override_entries)
    lib_entries = [
        _entry(
            "instrumentation.name",
            F.col("lib_name"),
            F.col("lib_name") != "",
        ),
        _entry(
            "instrumentation.version",
            F.col("lib_version"),
            (F.col("lib_name") != "") & (F.col("lib_version") != ""),
        ),
    ]
    common_pre = F.map_from_entries(
        F.concat(
            F.map_entries(F.col(resource_col)),
            F.map_entries(_build_map(lib_entries)),
        )
    )
    common = F.map_from_entries(
        F.concat(
            F.map_entries(
                F.map_filter(
                    common_pre,
                    lambda k, _v: ~F.array_contains(F.map_keys(overrides), k),
                )
            ),
            F.map_entries(overrides),
        )
    )

    return df.select(
        F.col("span_id"),
        F.col("trace_id"),
        F.col("parent_id"),
        F.col("name"),
        F.unix_millis(F.col("start_ts")).alias("timestamp_ms"),
        (
            F.unix_millis(F.col("end_ts")) - F.unix_millis(F.col("start_ts"))
        ).alias("duration_ms"),
        attributes.alias("attributes"),
        common.alias("common_attributes"),
        ((F.col("span_id") != "") & (F.col("trace_id") != "")).alias("valid"),
    )


def newrelic_logs(
    df: DataFrame,
    attrs_col: str = "attrs",
) -> DataFrame:
    """Log rows → (message, timestamp_ms, attributes) per Log (:121-167)."""
    own = F.map_filter(
        F.col(attrs_col),
        lambda k, _v: ~k.isin(*[F.lit(x) for x in OVERRIDE_KEYS]),
    )
    extra = [
        _entry("name", F.col("name")),
        _entry("trace.id", F.col("trace_id"), F.col("trace_id") != ""),
        _entry("span.id", F.col("span_id"), F.col("span_id") != ""),
        _entry(
            "log.level", F.col("severity_text"), F.col("severity_text") != ""
        ),
        _entry(
            "log.levelNum",
            F.col("severity_number"),
            F.col("severity_number") != 0,
        ),
    ]
    attributes = F.map_from_entries(
        F.concat(
            F.map_entries(
                F.map_filter(
                    own,
                    lambda k, _v: ~F.array_contains(
                        F.map_keys(_build_map(extra)), k
                    ),
                )
            ),
            F.map_entries(_build_map(extra)),
        )
    )
    message = F.when(F.col("body") != "", F.col("body")).otherwise(
        F.col("name")
    )
    return df.select(
        message.alias("message"),
        F.unix_millis(F.col("ts")).alias("timestamp_ms"),
        attributes.alias("attributes"),
    )
