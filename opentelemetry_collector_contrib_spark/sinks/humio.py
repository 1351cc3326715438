"""Humio structured-event exporter analogue.

Reference: exporter/humioexporter/traces_exporter.go —
  - ``tracesToHumioEvents`` (traces_exporter.go:118-161): a resource
    WITHOUT ``service.name`` is refused outright — its spans are dropped
    and surface in the error path (the required-field gate);
  - ``spanToHumioEvent`` (traces_exporter.go:163-198): attributes merge
    span-attrs-then-resource-attrs into one flat map — ``toHumioAttributes``
    iterates the maps in that order and each Range ASSIGNS, so on a key
    collision the RESOURCE value wins (the opposite of most exporters —
    reproduced faithfully); ``service.name`` is then DELETED from the
    merged map ("no need to store the service name in two places") and
    promoted to its own field; non-empty instrumentation library
    name/version are inserted under the otel.library.* conventions keys;
  - the event timestamp is the span start (``AsUnix`` renders it as unix
    nanoseconds — config.Traces.UnixTimestamps);
  - ``tagFromSpan`` + tagOrganizer (traces_exporter.go:248-260,
    tag_strategy.go): events group into per-tag batches by strategy —
    trace id, service name, or none (single untagged batch).

Spark design: one codegen'd map stage for the event shape; the tag is a
column, so the per-tag batching is the natural partitioning of a
downstream write (``.partitionBy(tag)``) rather than a driver-side
organizer. No UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SERVICE_NAME = "service.name"
LIB_NAME_KEY = "otel.library.name"
LIB_VERSION_KEY = "otel.library.version"

TAG_NONE = "none"
TAG_TRACE_ID = "trace_id"
TAG_SERVICE_NAME = "service_name"


def humio_events(
    spans: DataFrame,
    tag_strategy: str = TAG_NONE,
    unix_timestamps: bool = True,
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
    """spans → one Humio structured event per span.

    Output columns: tag, timestamp (unix ns LONG when ``unix_timestamps``
    else TIMESTAMP), trace_id, span_id, parent_span_id, name, kind,
    start_ns, end_ns, status_code, status_description, service_name,
    attributes (flat MAP), valid (False = resource lacks service.name —
    the reference refuses these spans; they are emitted flagged so the
    caller owns the drop/error accounting, same pattern as the other
    valid-flag sinks here).
    """
    res = F.col(resource_col)
    service = F.element_at(res, SERVICE_NAME)
    valid = service.isNotNull()

    # span attrs first, resource attrs second — resource WINS collisions
    # (toHumioAttributes assignment order); entries-concat + span-side
    # filter, never throws under mapKeyDedupPolicy=EXCEPTION
    span_attrs = F.col(attrs_col)
    res_keys = F.map_keys(res)
    merged = F.map_from_entries(
        F.concat(
            F.filter(
                F.map_entries(span_attrs),
                lambda e: ~F.array_contains(res_keys, e["key"]),
            ),
            F.map_entries(res),
        )
    )
    # delete the promoted service.name; insert non-empty library info
    extra = F.array().cast("array<struct<key:string,value:string>>")
    if lib_name_col is not None:
        lib_name = F.col(lib_name_col)
        extra = F.concat(
            extra,
            F.when(
                lib_name.isNotNull() & (lib_name != ""),
                F.array(F.struct(
                    F.lit(LIB_NAME_KEY).alias("key"),
                    lib_name.alias("value"),
                )),
            ).otherwise(F.array().cast("array<struct<key:string,value:string>>")),
        )
    if lib_version_col is not None:
        lib_ver = F.col(lib_version_col)
        extra = F.concat(
            extra,
            F.when(
                lib_ver.isNotNull() & (lib_ver != ""),
                F.array(F.struct(
                    F.lit(LIB_VERSION_KEY).alias("key"),
                    lib_ver.alias("value"),
                )),
            ).otherwise(F.array().cast("array<struct<key:string,value:string>>")),
        )
    attributes = F.map_from_entries(
        F.concat(
            F.filter(
                F.map_entries(merged),
                lambda e: (e["key"] != SERVICE_NAME)
                & (e["key"] != F.lit(LIB_NAME_KEY))
                & (e["key"] != F.lit(LIB_VERSION_KEY)),
            ),
            extra,
        )
    )

    if tag_strategy == TAG_TRACE_ID:
        tag = F.col(trace_col)
    elif tag_strategy == TAG_SERVICE_NAME:
        tag = F.coalesce(service, F.lit(""))
    else:
        tag = F.lit("")

    start_ns = F.col(start_ns_col).cast("long")
    ts = start_ns if unix_timestamps else F.timestamp_micros(
        F.floor(start_ns.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    )
    return spans.select(
        tag.alias("tag"),
        ts.alias("timestamp"),
        F.col(trace_col).alias("trace_id"),
        F.col(span_col).alias("span_id"),
        F.col(parent_col).alias("parent_span_id"),
        F.col(name_col).alias("name"),
        F.col(kind_col).alias("kind"),
        start_ns.alias("start_ns"),
        F.col(end_ns_col).cast("long").alias("end_ns"),
        F.col(status_code_col).alias("status_code"),
        F.col(status_msg_col).alias("status_description"),
        F.coalesce(service, F.lit("")).alias("service_name"),
        attributes.alias("attributes"),
        valid.alias("valid"),
    )
