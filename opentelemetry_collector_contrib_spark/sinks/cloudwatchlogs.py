"""AWS CloudWatch Logs exporter analogue.

Reference: exporter/awscloudwatchlogsexporter/exporter.go —
  - ``logToCWLog`` (exporter.go:163-191): each log record becomes one
    ``InputLogEvent`` — ``Timestamp`` is the record time truncated from
    nanoseconds to MILLISECONDS (``int64(log.Timestamp()) /
    int64(time.Millisecond)``, exporter.go:188) and ``Message`` is the
    JSON of ``cwLogBody`` (exporter.go:150-161), whose fields marshal in
    Go struct declaration order: name, body, severity_number,
    severity_text, dropped_attributes_count, flags, trace_id, span_id,
    attributes, resource;
  - every field is ``omitempty``.  Go's isEmptyValue per declared type:
    ``name``/``severity_text`` (string) drop when empty, the numeric
    fields drop when 0, and ``attributes``/``resource`` drop when the
    map is nil — ``attrsValue`` (exporter.go:193-203) returns nil for an
    EMPTY attribute map, so {} never appears.  ``body`` is declared
    ``interface{}``, so it drops only when the value itself is nil —
    an empty-STRING body is a non-nil interface and is KEPT (the one
    field where "" survives);
  - ``trace_id``/``span_id`` are set only when the id is non-empty
    (all-zero bytes = empty, exporter.go:174-179), rendered as lowercase
    hex;
  - map values marshal with SORTED keys (Go ``json.Marshal`` of a map);
  - ``logsToCWLogs`` (exporter.go:117-148) counts a record as dropped
    only when json.Marshal fails, which cannot happen for the value
    domain modeled here, so the dropped count is structurally 0;
  - the resource attribute map is computed once per ResourceLogs and
    embedded into every record's body (exporter.go:129, 181).

Spark design: ONE codegen'd projection — the body is
``to_json(struct(...))`` with the struct fields declared in the Go
order; ``to_json`` drops null fields (ignoreNullFields default), so each
omitempty rule is expressed by nulling the column under exactly the Go
emptiness condition.  No UDF, no shuffle: at 10^12 rows this is a pure
map stage that pipelines into whatever sink partitioning follows
(CloudWatch's real 10k-event/1 MiB PutLogEvents framing is transport
batching on the HTTP client, not a row transform — out of scope the same
way the SDK retry loop is).

Deliberate narrowings, documented: attribute/body values are modeled as
strings (the repo-wide map<string,string> attribute convention), so
typed bodies marshal as JSON strings here; Go's default HTML escaping of
``<``/``>``/``&`` inside json.Marshal is not reproduced (no such bytes
in the modeled value domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sorted_map_or_null(m: Column, key_type: str = "string") -> Column:
    """attrsValue (exporter.go:193-203): nil — and therefore omitted —
    when the map is empty; otherwise the map with Go's sorted-key
    marshal order."""
    return F.when(
        m.isNotNull() & (F.size(m) > 0),
        F.map_from_entries(F.array_sort(F.map_entries(m))),
    )


def _id_or_null(col: Column) -> Column:
    """TraceID/SpanID.IsEmpty gate (exporter.go:174-179): all-zero bytes
    is the empty id; hex input, so empty == '' or all '0' characters."""
    return F.when(
        col.isNotNull() & (col != "") & (F.translate(col, "0", "") != ""),
        col,
    )


def to_cw_log_events(
    logs: DataFrame,
    ts_ns_col: str = "ts_ns",
    name_col: str = "name",
    body_col: str = "body",
    severity_number_col: str = "severity_number",
    severity_text_col: str = "severity_text",
    dropped_col: str = "dropped_count",
    flags_col: str = "flags",
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    attrs_col: str = "attributes",
    resource_col: str = "resource",
) -> DataFrame:
    """log records → CloudWatch ``InputLogEvent`` rows.

    Output columns: ``timestamp`` (ms LONG, ns DIV 1e6 — integer
    division, no double round-trip: ns epochs exceed float53 precision)
    and ``message`` (the cwLogBody JSON).
    """
    name = F.col(name_col)
    sev_num = F.col(severity_number_col)
    sev_text = F.col(severity_text_col)
    dropped = F.col(dropped_col)
    flags = F.col(flags_col)

    body_struct = F.struct(
        # string omitempty: '' drops
        F.when(name.isNotNull() & (name != ""), name).alias("name"),
        # interface{} omitempty: only nil drops — '' is KEPT
        F.col(body_col).alias("body"),
        # numeric omitempty: 0 drops
        F.when(sev_num.isNotNull() & (sev_num != 0), sev_num)
        .cast("int").alias("severity_number"),
        F.when(sev_text.isNotNull() & (sev_text != ""), sev_text)
        .alias("severity_text"),
        F.when(dropped.isNotNull() & (dropped != 0), dropped)
        .cast("int").alias("dropped_attributes_count"),
        F.when(flags.isNotNull() & (flags != 0), flags)
        .cast("int").alias("flags"),
        _id_or_null(F.col(trace_col)).alias("trace_id"),
        _id_or_null(F.col(span_col)).alias("span_id"),
        _sorted_map_or_null(F.col(attrs_col)).alias("attributes"),
        _sorted_map_or_null(F.col(resource_col)).alias("resource"),
    )
    return logs.select(
        F.expr(f"{ts_ns_col} DIV 1000000").alias("timestamp"),
        F.to_json(body_struct).alias("message"),
    )
