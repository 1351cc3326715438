"""honeycomb exporter analogue: span rows → flat Honeycomb events.

Reference: exporter/honeycombexporter —
  - ids.go:37-60: trace id renders as 16-hex when the high 8 bytes are
    zero, else full 32-hex; span ids as plain hex, empty → ""
  - honeycomb.go:104-175 pushTraceData: one event per span carrying
    resource attrs, library.name/version (omitted when empty), span attrs,
    trace.trace_id/span_id/parent_id, name, duration_ms
    ((end-start)/1ms as float), span_kind, status.code, status.message
  - honeycomb.go:177-196 getSpanKind: OTLP kind → lowercase string,
    unknown → "unspecified"
  - honeycomb.go:290-300 addSampleRate: a configured integer span
    attribute becomes the event sample rate (libhoney default 1)
  - honeycomb.go:198-224 sendSpanLinks: each link → its own event with
    trace.link.* ids and meta.annotation_type "link"
  - honeycomb.go:226-262 sendMessageEvents: each span event → its own
    event underlaying resource attrs, with trace.parent_name and
    meta.annotation_type "span_event"

Spark design: all three event families are narrow projections (links and
message events via one ``explode`` generator each) — no UDF, no shuffle;
attribute precedence (span attrs over resource attrs) is a single
last-wins map merge. Fan-out to the sink rides write_fanout like every
other exporter shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZERO_HIGH = "0" * 16

_KIND = {"CLIENT": "client", "SERVER": "server", "PRODUCER": "producer",
         "CONSUMER": "consumer", "INTERNAL": "internal"}


def honeycomb_trace_id(trace_id: Column) -> Column:
    """ids.go:37-52: drop a leading all-zero high half."""
    return F.when(F.substring(trace_id, 1, 16) == _ZERO_HIGH,
                  F.substring(trace_id, 17, 16)).otherwise(trace_id)


def span_kind(kind: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in _KIND.items() for x in kv])
    return F.coalesce(m[kind], F.lit("unspecified"))


def _merged_fields(resource: Column, attrs: Column) -> Column:
    """Span attrs take precedence over same-keyed resource attrs (the
    AddField overlay order in pushTraceData)."""
    keys = F.map_keys(attrs)
    kept = F.map_filter(resource, lambda k, _v: ~F.array_contains(keys, k))
    return F.map_from_entries(F.concat(F.map_entries(kept), F.map_entries(attrs)))


def _sample_rate(attrs: Column, sample_rate_attr: str | None) -> Column:
    if not sample_rate_attr:
        return F.lit(1).cast("long")
    return F.coalesce(
        F.element_at(attrs, sample_rate_attr).cast("long"), F.lit(1))


def to_events(spans: DataFrame, sample_rate_attr: str | None = None) -> DataFrame:
    """One Honeycomb event per span (pushTraceData core loop). Expects
    (trace_id, span_id, parent_span_id, name, kind, status_code,
    status_message, start_ts, end_ts, attrs, resource, library_name,
    library_version)."""
    attrs, res = F.col("attrs"), F.col("resource")
    return spans.select(
        honeycomb_trace_id(F.col("trace_id")).alias("trace_id"),
        F.col("span_id").alias("span_id"),
        F.when(F.col("parent_span_id") != "", F.col("parent_span_id"))
         .alias("parent_id"),
        F.col("name"),
        ((F.col("end_ts") - F.col("start_ts")) * 1000.0).alias("duration_ms"),
        span_kind(F.col("kind")).alias("span_kind"),
        F.col("status_code").alias("status_code"),
        F.col("status_message").alias("status_message"),
        F.when(F.col("library_name") != "", F.col("library_name"))
         .alias("library_name"),
        F.when(F.col("library_version") != "", F.col("library_version"))
         .alias("library_version"),
        _sample_rate(attrs, sample_rate_attr).alias("samplerate"),
        _merged_fields(res, attrs).alias("fields"),
    )


def link_events(spans: DataFrame, sample_rate_attr: str | None = None) -> DataFrame:
    """sendSpanLinks: explode ``links array<struct<trace_id, span_id,
    attrs map>>`` into meta.annotation_type=link events."""
    l = F.col("l")
    return (spans
            .select("trace_id", "span_id", F.explode("links").alias("l"))
            .select(
                honeycomb_trace_id(F.col("trace_id")).alias("trace_id"),
                F.col("span_id").alias("parent_id"),
                honeycomb_trace_id(l["trace_id"]).alias("link_trace_id"),
                l["span_id"].alias("link_span_id"),
                F.lit("link").alias("annotation_type"),
                _sample_rate(l["attrs"], sample_rate_attr).alias("samplerate"),
                l["attrs"].alias("fields"),
            ))


def message_events(spans: DataFrame,
                   sample_rate_attr: str | None = None) -> DataFrame:
    """sendMessageEvents: explode ``events array<struct<ts, name,
    attrs map>>``; resource attrs underlay the event attrs."""
    ev = F.col("ev")
    return (spans
            .select("trace_id", "span_id", F.col("name").alias("span_name"),
                    "resource", F.explode("events").alias("ev"))
            .select(
                ev["ts"].alias("ts"),
                ev["name"].alias("name"),
                honeycomb_trace_id(F.col("trace_id")).alias("trace_id"),
                F.col("span_id").alias("parent_id"),
                F.col("span_name").alias("parent_name"),
                F.lit("span_event").alias("annotation_type"),
                _sample_rate(ev["attrs"], sample_rate_attr).alias("samplerate"),
                _merged_fields(F.col("resource"), ev["attrs"]).alias("fields"),
            ))
