"""Azure Monitor (Application Insights) exporter analogue: span → envelope.

Reference: exporter/azuremonitorexporter/trace_to_envelope.go —
  - :53-156 spanToEnvelope: SpanKind UNSPECIFIED ⇒ INTERNAL; Server/
    Consumer spans become RequestData envelopes, Client/Producer/Internal
    become RemoteDependencyData (Internal additionally forces
    ``Type = "InProc"``); FaaS spans are unsupported and dropped with an
    error; envelope tags carry ai.operation.id (trace id),
    ai.operation.parentId, ai.operation.name (requests only),
    ai.cloud.role (``service.namespace + "." + service.name`` when the
    namespace exists) and ai.cloud.roleInstance (service.instance);
    resource attrs and instrumentation name/version land in the data
    properties, plus the raw otel status code name and (when non-empty)
    the status message;
  - :588-619 mapIncomingSpanToType: rpc.system > http.method > db.system
    > messaging.system > faas.trigger, else unknown (also unknown when
    the span has NO attributes);
  - :622-626 getDefaultFormattedSpanStatus: ResponseCode/ResultCode is
    the NUMERIC status code as a string; success = code != ERROR;
  - :211-241 HTTP overrides: http.status_code (when set) becomes the
    response code with success = 100..399, and the request name becomes
    ``{method} {route-or-span-name}`` with the route '/'-prefixed;
  - time_utils.go:14-31: envelope time is RFC3339Nano of the start stamp
    and the duration serializes as ``DD.HH:MM:SS.ffffff`` (two-digit
    days — byte-faithful here, including the day overflow at 100 days).

Spark design: one guarded-projection map stage (when-ladders + a
format_string for the duration) — no UDF, no shuffle; the coverage is the
envelope skeleton + default/HTTP status paths; the RPC/DB/messaging
name-assembly variants share the same shape and are not reproduced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REQUEST_ENVELOPE = "Microsoft.ApplicationInsights.Request"
DEPENDENCY_ENVELOPE = "Microsoft.ApplicationInsights.RemoteDependency"

# numeric pdata status codes (STATUS_CODE_* → int), api.md#set-status
_STATUS_NUM = {"STATUS_CODE_UNSET": 0, "STATUS_CODE_OK": 1, "STATUS_CODE_ERROR": 2}


def format_duration(micros: Column) -> Column:
    """time_utils.go:18-31 formatDuration, microsecond precision."""
    day = (micros / F.lit(86_400_000_000)).cast("long")
    rem = micros - day * F.lit(86_400_000_000)
    h = (rem / F.lit(3_600_000_000)).cast("long")
    rem = rem - h * F.lit(3_600_000_000)
    m = (rem / F.lit(60_000_000)).cast("long")
    rem = rem - m * F.lit(60_000_000)
    s = (rem / F.lit(1_000_000)).cast("long")
    us = rem - s * F.lit(1_000_000)
    return F.format_string("%02d.%02d:%02d:%02d.%06d", day, h, m, s, us)


def _span_type(attrs: Column) -> Column:
    """mapIncomingSpanToType precedence ladder."""
    return (
        F.when(F.size(F.map_keys(attrs)) == 0, "unknown")
        .when(F.map_contains_key(attrs, "rpc.system"), "rpc")
        .when(F.map_contains_key(attrs, "http.method"), "http")
        .when(F.map_contains_key(attrs, "db.system"), "database")
        .when(F.map_contains_key(attrs, "messaging.system"), "messaging")
        .when(F.map_contains_key(attrs, "faas.trigger"), "faas")
        .otherwise("unknown")
    )


def spans_to_envelopes(
    df: DataFrame,
    attrs_col: str = "attrs",
    resource_col: str = "resource",
) -> DataFrame:
    """Span rows → envelope rows.

    Expects: trace_id, parent_span_id, name, kind (SPAN_KIND_*),
    status_code (STATUS_CODE_*), status_message, start_ts, end_ts
    (timestamps), ``attrs`` and ``resource`` MAP columns, lib_name,
    lib_version.  Emits one row per supported span with ``valid = false``
    for FaaS spans (errUnsupportedSpanType).
    """
    attrs = F.col(attrs_col)
    res = F.col(resource_col)
    kind = F.when(
        F.col("kind") == "SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL"
    ).otherwise(F.col("kind"))
    stype = _span_type(attrs)
    is_request = kind.isin("SPAN_KIND_SERVER", "SPAN_KIND_CONSUMER")

    status_num = F.create_map(
        *[F.lit(x) for kv in _STATUS_NUM.items() for x in kv]
    )[F.col("status_code")]
    default_code = status_num.cast("string")
    default_success = F.col("status_code") != "STATUS_CODE_ERROR"
    http_status = F.element_at(attrs, "http.status_code").try_cast("long")
    use_http = (stype == "http") & http_status.isNotNull() & (http_status != 0)
    response_code = F.when(use_http, http_status.cast("string")).otherwise(
        default_code
    )
    success = F.when(
        use_http, (http_status >= 100) & (http_status <= 399)
    ).otherwise(default_success)

    http_route = F.element_at(attrs, "http.route")
    route_or_name = F.when(
        http_route.isNotNull() & (http_route != ""),
        F.when(http_route.startswith("/"), http_route).otherwise(
            F.concat(F.lit("/"), http_route)
        ),
    ).otherwise(F.col("name"))
    data_name = F.when(
        stype == "http",
        F.concat(F.element_at(attrs, "http.method"), F.lit(" "), route_or_name),
    ).otherwise(F.col("name"))

    dep_type = F.when(kind == "SPAN_KIND_INTERNAL", F.lit("InProc")).otherwise(
        F.element_at(attrs, "db.system")
    )

    svc = F.element_at(res, "service.name")
    ns = F.element_at(res, "service.namespace")
    cloud_role = F.when(
        svc.isNotNull(),
        F.when(ns.isNotNull(), F.concat(ns, F.lit("."), svc)).otherwise(svc),
    )

    micros = F.unix_micros(F.col("end_ts")) - F.unix_micros(F.col("start_ts"))

    return df.select(
        F.when(is_request, F.lit(REQUEST_ENVELOPE))
        .otherwise(F.lit(DEPENDENCY_ENVELOPE))
        .alias("envelope_name"),
        F.when(is_request, F.lit("RequestData"))
        .otherwise(F.lit("RemoteDependencyData"))
        .alias("base_type"),
        # RFC3339Nano like time_utils.go: fractional seconds with trailing
        # zeros trimmed and the dot dropped for whole-second stamps (Go's
        # RFC3339Nano format does both).  Micros is Spark timestamp
        # precision — nanosecond inputs don't exist in this engine.
        F.regexp_replace(
            F.regexp_replace(
                F.date_format(
                    F.col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
                ),
                r"(\.\d*?)0*(Z|[+-]\d{2}:\d{2})$",
                "$1$2",
            ),
            r"\.(Z|[+-]\d{2}:\d{2})$",
            "$1",
        ).alias("time"),
        F.col("trace_id").alias("operation_id"),
        F.col("parent_span_id").alias("operation_parent_id"),
        F.when(is_request, data_name).alias("operation_name"),
        data_name.alias("data_name"),
        format_duration(micros).alias("duration"),
        response_code.alias("response_code"),
        success.alias("success"),
        F.when(~is_request, dep_type).alias("dependency_type"),
        cloud_role.alias("cloud_role"),
        F.element_at(res, "service.instance.id").alias("cloud_role_instance"),
        stype.alias("span_type"),
        (stype != "faas").alias("valid"),
    )
