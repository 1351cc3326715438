"""Alibaba Cloud Log Service (SLS) exporter analogue.

Reference: exporter/alibabacloudlogserviceexporter —
  - ``spanToLogServiceData`` (tracedata_to_logservice.go:74-157): one SLS
    log per span, ``Time`` = END timestamp in whole seconds (uint32; an
    unset end stamps server-side ``now()`` — surfaced here as NULL, the
    same batch-engine deviation as the other server-stamped sinks);
    start/end/duration are MICROSECOND strings (ns/1000); span kind uses
    the lowercase OpenTracing short strings; status is UNSET/OK/ERROR;
    the attribute map serializes to JSON (Go ``json.Marshal`` sorts map
    keys — reproduced by sorting entries before ``to_json``).  Deliberate
    deviation: with an unset end timestamp the reference's uint64
    ``end - start`` WRAPS to a huge positive number
    (tracedata_to_logservice.go:137-140); signed arithmetic here yields
    the equivalent negative value instead — equally "obviously invalid"
    to a consumer, without reproducing an arithmetic overflow.
  - ``resourceToLogContents`` (logsdata_to_logservice.go:69-111):
    ``host.name``/``service.name`` are promoted to dedicated ``host`` /
    ``service`` keys (empty string when absent) and EXCLUDED from the
    remaining-resource JSON blob.
  - ``instrumentationLibraryToLogContents``: library name/version ride as
    ``otlp.name`` / ``otlp.version``.

Spark design: one codegen'd map stage; kind/status ladders are CASE
chains, the sorted-key JSON is ``to_json(map_from_entries(array_sort))``.
No UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_NAME = "host.name"
SERVICE_NAME = "service.name"

# collector tracetranslator OpenTracing short strings
_KIND_SHORT = {
    "SPAN_KIND_INTERNAL": "internal",
    "SPAN_KIND_CLIENT": "client",
    "SPAN_KIND_SERVER": "server",
    "SPAN_KIND_PRODUCER": "producer",
    "SPAN_KIND_CONSUMER": "consumer",
}

_STATUS_SHORT = {
    "STATUS_CODE_ERROR": "ERROR",
    "STATUS_CODE_OK": "OK",
}


def _sorted_json(m: Column) -> Column:
    """JSON of a MAP with keys sorted — byte-compatible with Go's
    json.Marshal of a map[string]string."""
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(m))))


def _us_string(ns: Column) -> Column:
    # exact integer ns -> us (int64 ns exceed double's mantissa)
    return F.floor(
        ns.cast("decimal(38,0)") / F.lit(1000)
    ).cast("long").cast("string")


def sls_logs(
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
    trace_state_col: str | None = None,
    resource_col: str = "resource",
    attrs_col: str = "attributes",
    lib_name_col: str | None = "lib_name",
    lib_version_col: str | None = "lib_version",
) -> DataFrame:
    """spans → one SLS log row per span (flat key/value content model)."""
    res = F.col(resource_col)
    host = F.coalesce(F.element_at(res, HOST_NAME), F.lit(""))
    service = F.coalesce(F.element_at(res, SERVICE_NAME), F.lit(""))
    res_rest = F.map_filter(
        res, lambda k, _v: (k != HOST_NAME) & (k != SERVICE_NAME)
    )

    kind = F.col(kind_col)
    kind_short = F.coalesce(
        *[F.when(kind == k, F.lit(v)) for k, v in _KIND_SHORT.items()],
        F.lit("unspecified"),
    )
    code = F.col(status_code_col)
    status_short = F.coalesce(
        *[F.when(code == k, F.lit(v)) for k, v in _STATUS_SHORT.items()],
        F.lit("UNSET"),
    )

    start_ns = F.col(start_ns_col).cast("long")
    end_ns = F.col(end_ns_col).cast("long")
    time_sec = F.when(
        end_ns.isNotNull() & (end_ns != 0),
        F.floor(end_ns.cast("decimal(38,0)") / F.lit(1000000000)).cast("long"),
    )
    trace_state = (
        F.coalesce(F.col(trace_state_col), F.lit(""))
        if trace_state_col is not None
        else F.lit("")
    )
    cols = [
        time_sec.alias("time"),
        host.alias("host"),
        service.alias("service"),
        _sorted_json(res_rest).alias("resource"),
        (F.coalesce(F.col(lib_name_col), F.lit(""))
         if lib_name_col else F.lit("")).alias("otlp_name"),
        (F.coalesce(F.col(lib_version_col), F.lit(""))
         if lib_version_col else F.lit("")).alias("otlp_version"),
        F.col(trace_col).alias("traceID"),
        F.col(span_col).alias("spanID"),
        # HexString() of an empty parent is "" — compatible by contract
        F.coalesce(F.col(parent_col), F.lit("")).alias("parentSpanID"),
        kind_short.alias("kind"),
        F.col(name_col).alias("name"),
        trace_state.alias("traceState"),
        _us_string(start_ns).alias("start"),
        _us_string(end_ns).alias("end"),
        _us_string(end_ns - start_ns).alias("duration"),
        _sorted_json(F.col(attrs_col)).alias("attribute"),
        status_short.alias("statusCode"),
        F.coalesce(F.col(status_msg_col), F.lit("")).alias("statusMessage"),
    ]
    return spans.select(*cols)
