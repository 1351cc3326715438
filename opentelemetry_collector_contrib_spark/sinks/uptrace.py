"""Uptrace exporter analogue.

Reference: exporter/uptraceexporter —
  - ``pushTraceData`` (exporter.go:41-100): span and parent ids become
    **little-endian uint64** of their 8 bytes (``asUint64``,
    translator.go:27-29 — binary.LittleEndian), trace id stays 16 raw
    bytes (hex here); an empty parent id maps to 0;
  - kind lowers via translator.go:31-43 (default "internal" — note the
    reference folds UNSPECIFIED into internal, unlike tanzu);
  - status lowers to ok/error/unset (translator.go:45-53);
  - start/end are raw UNIX NANOSECONDS (int64);
  - resource/span attributes pass through typed; null-valued entries are
    DROPPED ("Uptrace does not support nulls", translator.go:83-85);
    mixed-type arrays and maps fall back to a JSON string label
    (jsonLabelValue) — in this engine's string-map attribute model the
    typed passthrough is the MAP itself with null values filtered;
  - instrumentation library rides as tracer_name/tracer_version.

One codegen'd map stage.  The uint64 id is rendered as a DECIMAL STRING
via base conversion (``conv(reversed_hex, 16, 10)``) because the full
uint64 range exceeds Spark's signed LONG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KIND = {
    "SPAN_KIND_CLIENT": "client",
    "SPAN_KIND_SERVER": "server",
    "SPAN_KIND_PRODUCER": "producer",
    "SPAN_KIND_CONSUMER": "consumer",
}

_STATUS = {"STATUS_CODE_OK": "ok", "STATUS_CODE_ERROR": "error"}


def le_uint64(hex16: Column) -> Column:
    """16-hex-char id → little-endian uint64 as a decimal string
    (binary.LittleEndian.Uint64 of the 8 bytes; empty/invalid → "0")."""
    ok = hex16.rlike("^[0-9a-fA-F]{16}$")
    reversed_hex = F.concat(
        *[F.substring(hex16, pos, 2) for pos in (15, 13, 11, 9, 7, 5, 3, 1)]
    )
    return F.when(ok, F.conv(reversed_hex, 16, 10)).otherwise(F.lit("0"))


def uptrace_spans(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_id",
    name_col: str = "name",
    kind_col: str = "kind",
    status_code_col: str = "status_code",
    status_msg_col: str = "status_message",
    start_ns_col: str = "start_ns",
    end_ns_col: str = "end_ns",
    resource_col: str = "resource",
    attrs_col: str = "attributes",
    lib_name_col: str | None = "lib_name",
    lib_version_col: str | None = "lib_version",
) -> DataFrame:
    """spans → Uptrace span rows (see module docstring for id/ladder
    semantics)."""
    kind = F.col(kind_col)
    kind_out = F.coalesce(
        *[F.when(kind == k, F.lit(v)) for k, v in _KIND.items()],
        F.lit("internal"),
    )
    code = F.col(status_code_col)
    status_out = F.coalesce(
        *[F.when(code == k, F.lit(v)) for k, v in _STATUS.items()],
        F.lit("unset"),
    )
    drop_nulls = lambda m: F.map_filter(m, lambda _k, v: v.isNotNull())
    return spans.select(
        le_uint64(F.col(span_col)).alias("id"),
        le_uint64(F.coalesce(F.col(parent_col), F.lit(""))).alias("parent_id"),
        F.col(trace_col).alias("trace_id"),
        F.col(name_col).alias("name"),
        kind_out.alias("kind"),
        F.col(start_ns_col).cast("long").alias("start_time"),
        F.col(end_ns_col).cast("long").alias("end_time"),
        drop_nulls(F.col(resource_col)).alias("resource"),
        drop_nulls(F.col(attrs_col)).alias("attrs"),
        status_out.alias("status_code"),
        F.coalesce(F.col(status_msg_col), F.lit("")).alias("status_message"),
        (F.coalesce(F.col(lib_name_col), F.lit(""))
         if lib_name_col else F.lit("")).alias("tracer_name"),
        (F.coalesce(F.col(lib_version_col), F.lit(""))
         if lib_version_col else F.lit("")).alias("tracer_version"),
    )
