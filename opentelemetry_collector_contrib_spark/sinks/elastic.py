"""Elastic APM exporter analogue (transaction/span document model).

Reference: exporter/elasticexporter/internal/translator/elastic/traces.go —
  - ``EncodeSpan`` (traces.go:42-100): a span becomes an APM
    **transaction** when it is a local root (empty parent id) OR its kind
    is SERVER; every other span becomes an APM **span** document.
    Duration is FRACTIONAL milliseconds (endTime.Sub(start).Seconds()*1000).
  - ``setTransactionProperties`` (traces.go:101-221): transaction type is
    "request" when any http.* well-known attribute produced a Request
    context, else "unknown"; Result is "OK"/"Error" by status code.
  - ``setSpanProperties`` (traces.go:223-357): span type ladder —
    http.* context → type "external" subtype "http"; db.* context →
    type "db" subtype db.system; else type "app".  For external HTTP the
    destination service resource is host:port with the scheme default
    port APPENDED when the URL carries none (traces.go:328-337,
    schemeDefaultPort:611-618), while the destination service URL never
    keeps an explicit default port; for db spans the destination service
    name/resource are both db.system (traces.go:340-348).
  - ``spanStatusOutcome`` (traces.go:621-629): success/failure by status;
    UNSET leaves outcome empty (the server decides).
  - labels: non-well-known attributes with ``cleanLabelKey``
    (utils.go:28,49-51: '.', '*', '"' → '_'; 1024-rune truncate).
  - service names sanitize via ``[^a-zA-Z0-9 _-]`` → '_'
    (cleanServiceName, utils.go:27,45-47).

Scoped to this engine's string-attribute span model; one codegen'd map
stage, no UDF, no shuffle.  Truncation uses character (not rune) length —
equivalent for the BMP strings this pipeline carries; documented
deviation for astral-plane label keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions import urlutil

_HTTP_TX_KEYS = [
    "http.method", "http.url", "http.target", "http.host", "http.scheme",
    "http.status_code", "http.flavor", "http.server_name",
    "http.client_ip", "http.user_agent",
]
_HTTP_SPAN_KEYS = [
    "http.url", "http.target", "http.host", "http.scheme",
    "http.status_code",
]
_WELL_KNOWN = set(_HTTP_TX_KEYS) | {
    "http.remote_addr", "net.peer.ip", "net.peer.port", "net.peer.name",
    "net.host.name", "net.host.port", "db.system", "db.name",
    "db.statement", "db.user",
}


def clean_service_name(col: Column) -> Column:
    return F.regexp_replace(
        F.substring(col, 1, 1024), "[^a-zA-Z0-9 _-]", "_"
    )


def clean_label_key(col: Column) -> Column:
    return F.translate(F.substring(col, 1, 1024), '.*"', "___")


def span_status_outcome(code: Column) -> Column:
    return (
        F.when(code == "STATUS_CODE_OK", "success")
        .when(code == "STATUS_CODE_ERROR", "failure")
        .otherwise("")
    )


def _has_any(attrs: Column, keys: list[str]) -> Column:
    cond = F.lit(False)
    for k in keys:
        cond = cond | F.element_at(attrs, k).isNotNull()
    return cond


def elastic_docs(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_id",
    name_col: str = "name",
    kind_col: str = "kind",
    status_code_col: str = "status_code",
    start_ns_col: str = "start_ns",
    end_ns_col: str = "end_ns",
    attrs_col: str = "attributes",
    resource_col: str = "resource",
) -> DataFrame:
    """spans → APM documents: doc_type (transaction|span), ids, name,
    timestamp_us, duration_ms (fractional), outcome, result
    (transactions), type/subtype, destination_resource, service_name
    (sanitized from resource service.name), labels (cleaned keys for
    non-well-known attrs)."""
    attrs = F.col(attrs_col)
    parent = F.coalesce(F.col(parent_col), F.lit(""))
    is_tx = (parent == "") | (F.col(kind_col) == "SPAN_KIND_SERVER")

    code = F.col(status_code_col)
    outcome = span_status_outcome(code)
    result = F.when(
        is_tx,
        F.when(code == "STATUS_CODE_OK", "OK")
        .when(code == "STATUS_CODE_ERROR", "Error"),
    )

    has_http_tx = _has_any(attrs, _HTTP_TX_KEYS)
    has_http_span = _has_any(attrs, _HTTP_SPAN_KEYS) | F.element_at(
        attrs, "http.method"
    ).isNotNull()
    db_system = F.element_at(attrs, "db.system")
    has_db = _has_any(attrs, ["db.system", "db.name", "db.statement", "db.user"])

    tx_type = F.when(has_http_tx, "request").otherwise("unknown")
    span_type = (
        F.when(has_http_span, "external")
        .when(has_db, "db")
        .otherwise("app")
    )
    span_subtype = (
        F.when(has_http_span, F.lit("http"))
        .when(has_db, db_system)
    )

    # destination service resource for external HTTP: host:port where the
    # port is explicit or the scheme default (traces.go:328-337); for db:
    # db.system (traces.go:340-348)
    url = F.element_at(attrs, "http.url")
    parts = urlutil.url_parts(url)
    scheme = F.when(parts["scheme"] == "", "http").otherwise(parts["scheme"])
    default_port = (
        F.when(scheme == "http", "80")
        .when(scheme == "https", "443")
        .otherwise("")
    )
    port = F.when(parts["port"] == "", default_port).otherwise(parts["port"])
    http_resource = F.when(
        url.isNotNull() & (parts["host"] != ""),
        F.when(
            port == "", parts["host"]
        ).otherwise(F.concat(parts["host"], F.lit(":"), port)),
    )
    destination_resource = F.when(
        ~is_tx,
        F.when(has_http_span, http_resource).when(has_db, db_system),
    )

    labels = F.map_from_entries(
        F.transform(
            F.filter(
                F.map_entries(attrs),
                lambda e: ~e["key"].isin(*sorted(_WELL_KNOWN)),
            ),
            lambda e: F.struct(
                clean_label_key(e["key"]).alias("key"),
                e["value"].alias("value"),
            ),
        )
    )

    start_ns = F.col(start_ns_col).cast("long")
    end_ns = F.col(end_ns_col).cast("long")
    return spans.select(
        F.when(is_tx, "transaction").otherwise("span").alias("doc_type"),
        F.col(trace_col).alias("trace_id"),
        F.col(span_col).alias("span_id"),
        parent.alias("parent_id"),
        F.substring(F.col(name_col), 1, 1024).alias("name"),
        F.floor(start_ns.cast("decimal(38,0)") / F.lit(1000)).cast("long")
        .alias("timestamp_us"),
        ((end_ns - start_ns) / F.lit(1000000.0)).alias("duration_ms"),
        outcome.alias("outcome"),
        result.alias("result"),
        F.when(is_tx, tx_type).otherwise(span_type).alias("type"),
        F.when(~is_tx, span_subtype).alias("subtype"),
        destination_resource.alias("destination_resource"),
        clean_service_name(
            F.coalesce(F.element_at(F.col(resource_col), "service.name"), F.lit(""))
        ).alias("service_name"),
        labels.alias("labels"),
    )
