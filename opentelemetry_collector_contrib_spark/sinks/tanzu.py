"""Tanzu Observability (Wavefront) trace exporter analogue.

Reference: exporter/tanzuobservabilityexporter/transformer.go —
  - ``Span`` (transformer.go:58-95): trace/span/parent ids become UUIDs.
    A 16-byte trace id parses straight into a UUID; an 8-byte span id is
    LEFT-padded to 16 bytes first (padTo16Bytes, transformer.go:216-220),
    so its UUID is ``00000000-0000-0000-xxxx-xxxxxxxxxxxx``.  An empty /
    unparsable trace or span id invalidates the span (errInvalidTraceID /
    errInvalidSpanID, the exporter drops it); an empty parent maps to
    uuid.Nil.
  - ``attributesToTags`` (transformer.go:156-171): resource attributes
    first, span attributes second, LATER VALUES OVERWRITE EARLIER ones.
  - ``setRequiredTags`` (transformer.go:117-128): if no ``service`` tag,
    promote ``service.name`` into it (DELETING service.name) else default
    to "defaultService"; ``application`` defaults to "defaultApp".
  - ``spanKind`` ladder (transformer.go:97-115) → the ``span.kind`` tag.
  - ``errorTagsFromStatus`` (transformer.go:173-191): ``status.code`` is
    always tagged; ERROR status additionally tags ``error=true`` and a
    ``status.message`` truncated to 255 - len("status.message=") = 240
    bytes.
  - ``calculateTimes`` (transformer.go:145-154): ns → ms for start;
    duration in ms, clamped to 0 when the end timestamp is unset.

Spark design: one codegen'd map stage — UUID assembly is substring
concatenation over the hex ids, the tag merge is an entries-concat with
span-side-wins filtering (no map_concat, which throws on duplicate keys
under mapKeyDedupPolicy=EXCEPTION), kind/status ladders are CASE chains.
No UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_APPLICATION = "defaultApp"
DEFAULT_SERVICE = "defaultService"
NIL_UUID = "00000000-0000-0000-0000-000000000000"
# 255 - len("status.message=")
_STATUS_MSG_MAX = 240

_KIND_LADDER = {
    "CLIENT": "client",
    "SERVER": "server",
    "PRODUCER": "producer",
    "CONSUMER": "consumer",
    "INTERNAL": "internal",
    "UNSPECIFIED": "unspecified",
}


def _hex32_to_uuid(h: Column) -> Column:
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def trace_uuid(trace_id: Column) -> Column:
    """32-hex trace id → UUID; NULL when invalid (non-hex, wrong length,
    or all-zero — uuid.Parse failure / IsEmpty, transformer.go:193-199)."""
    ok = trace_id.rlike("^[0-9a-fA-F]{32}$") & (
        trace_id != "0" * 32
    )
    return F.when(ok, _hex32_to_uuid(F.lower(trace_id)))


def span_uuid(span_id: Column) -> Column:
    """16-hex span id → UUID of the LEFT-padded 16-byte form; NULL when
    invalid/empty (transformer.go:201-208,216-220)."""
    ok = span_id.rlike("^[0-9a-fA-F]{16}$") & (span_id != "0" * 16)
    return F.when(ok, _hex32_to_uuid(F.concat(F.lit("0" * 16), F.lower(span_id))))


def parent_uuid(parent_id: Column) -> Column:
    """Like :func:`span_uuid` but empty/invalid maps to uuid.Nil instead
    of invalidating (parentSpanIDtoUUID, transformer.go:210-214)."""
    return F.coalesce(span_uuid(parent_id), F.lit(NIL_UUID))


def _merged_tags(resource: Column, attrs: Column) -> Column:
    """attributesToTags order: resource first, span attrs second, later
    wins.  Entries-concat + left-side filter (never throws on dup keys)."""
    span_keys = F.map_keys(attrs)
    base = F.map_filter(resource, lambda k, _v: ~F.array_contains(span_keys, k))
    return F.map_from_entries(
        F.concat(F.map_entries(base), F.map_entries(attrs))
    )


def tanzu_spans(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_id",
    name_col: str = "name",
    kind_col: str = "kind",
    status_code_col: str = "status_code",
    status_msg_col: str = "status_message",
    start_col: str = "start_ns",
    end_col: str = "end_ns",
    resource_col: str = "resource",
    attrs_col: str = "attributes",
) -> DataFrame:
    """spans → Tanzu/Wavefront span rows.

    Output: name, trace_uuid, span_uuid, parent_uuid, start_millis,
    duration_millis, tags (MAP — merged attrs + required + kind/status
    tags), valid (False when the trace or span id failed UUID parse; the
    reference drops those with an error counter).
    """
    t_uuid = trace_uuid(F.col(trace_col))
    s_uuid = span_uuid(F.col(span_col))

    merged = _merged_tags(F.col(resource_col), F.col(attrs_col))
    # setRequiredTags: service <- service.name (delete) else default
    has_service = F.element_at(merged, "service").isNotNull()
    svc_name = F.element_at(merged, "service.name")
    merged = F.when(has_service, merged).otherwise(
        F.map_from_entries(
            F.concat(
                F.filter(
                    F.map_entries(merged),
                    lambda e: e["key"] != "service.name",
                ),
                F.array(
                    F.struct(
                        F.lit("service").alias("key"),
                        F.coalesce(svc_name, F.lit(DEFAULT_SERVICE)).alias(
                            "value"
                        ),
                    )
                ),
            )
        )
    )
    merged = F.when(
        F.element_at(merged, "application").isNotNull(), merged
    ).otherwise(
        F.map_from_entries(
            F.concat(
                F.map_entries(merged),
                F.array(
                    F.struct(
                        F.lit("application").alias("key"),
                        F.lit(DEFAULT_APPLICATION).alias("value"),
                    )
                ),
            )
        )
    )

    kind = F.col(kind_col)
    kind_tag = F.coalesce(
        *[
            F.when(kind == k, F.lit(v))
            for k, v in _KIND_LADDER.items()
        ],
        F.lit("unknown"),
    )
    code = F.col(status_code_col)
    is_err = code == 2  # pdata.StatusCodeError
    msg = F.col(status_msg_col)
    status_entries = F.concat(
        F.array(
            F.struct(
                F.lit("span.kind").alias("key"), kind_tag.alias("value")
            ),
            F.struct(
                F.lit("status.code").alias("key"),
                code.cast("string").alias("value"),
            ),
        ),
        F.when(
            is_err,
            F.concat(
                F.array(
                    F.struct(
                        F.lit("error").alias("key"), F.lit("true").alias("value")
                    )
                ),
                F.when(
                    msg.isNotNull() & (msg != ""),
                    F.array(
                        F.struct(
                            F.lit("status.message").alias("key"),
                            F.substring(msg, 1, _STATUS_MSG_MAX).alias("value"),
                        )
                    ),
                ).otherwise(F.array().cast("array<struct<key:string,value:string>>")),
            ),
        ).otherwise(F.array().cast("array<struct<key:string,value:string>>")),
    )
    # kind/status tags overwrite colliding attr keys (Go map writes last)
    status_keys = F.transform(status_entries, lambda e: e["key"])
    tags = F.map_from_entries(
        F.concat(
            F.filter(
                F.map_entries(merged),
                lambda e: ~F.array_contains(status_keys, e["key"]),
            ),
            status_entries,
        )
    )

    # exact integer ns -> ms: int64 ns at current epochs (~1.7e18) exceed
    # double's 2^53 mantissa, so a float division can flip a millisecond
    # boundary — decimal division + floor matches Go's int64 truncation
    def _ns_to_ms(c: Column) -> Column:
        return F.floor(
            c.cast("decimal(38,0)") / F.lit(1000000)
        ).cast("long")

    start_ms = _ns_to_ms(F.col(start_col).cast("long"))
    end_ns = F.col(end_col).cast("long")
    dur_ms = F.when(
        end_ns.isNull() | (end_ns == 0), F.lit(0).cast("long")
    ).otherwise(_ns_to_ms(end_ns) - start_ms)

    return spans.select(
        F.col(name_col).alias("name"),
        t_uuid.alias("trace_uuid"),
        s_uuid.alias("span_uuid"),
        parent_uuid(F.col(parent_col)).alias("parent_uuid"),
        start_ms.alias("start_millis"),
        dur_ms.alias("duration_millis"),
        tags.alias("tags"),
        (t_uuid.isNotNull() & s_uuid.isNotNull()).alias("valid"),
    )
