"""logzio exporter analogue — spans → Jaeger-model Logz.io span documents.

Reference: exporter/logzioexporter/exporter.go.  pushTraceData
(exporter.go:98-112) translates the batch to Jaeger-model spans, stamps
each span with its batch's Process (:103-105 ``span.Process =
batch.Process``), and hands every span to the Logz.io span writer; a span
that fails conversion is DROPPED with a debug log, never failing the
batch (:106-108).  The Jaeger translation semantics are the ones the
sibling in-reference translator implements
(exporter/jaegerthrifthttpexporter/protospan_to_jaegerthrift.go):

  - ids: trace id = (high, low) signed int64 pair of the 16 big-endian
    bytes, span/parent ids = signed int64 of the 8 bytes
    (protospan_to_jaegerthrift.go:493-509); a zero or non-decodable
    trace/span id makes the span invalid (:198-211), while an EMPTY
    parent id is simply 0 (:212-219);
  - startTime / duration are epoch MICROSECONDS (:220-230, :443-448);
  - attributes become typed tags (string/long/bool/double ladder,
    :450-491);
  - the ``span.kind`` tag is appended only when the attributes don't
    already carry one, and only CLIENT/SERVER kinds map (OpenTracing
    values ``client``/``server``) — other kinds add no tag (:235-238,
    :313-334);
  - status tags are appended only when the attributes carry NEITHER
    ``status.code`` NOR ``status.message``: ``status.code`` always
    (LONG), ``status.message`` only when non-empty (:239-243, :290-311);
  - links become references: CHILD_OF for parent-linked spans, every
    other link type FOLLOWS_FROM (:250-288);
  - process: service name + resource labels as string tags; with no
    service info at all the writer-side fallback is the constant
    ``unknown-service-name`` process (:31, :66-69,:147-183).

The Logz.io document shape follows the public jaeger-logzio store
(github.com/logzio/jaeger-logzio, store/objects): the Jaeger ES span
model plus ``type: "span"``, a millisecond ``@timestamp`` next to the
microsecond ``startTime``, and the span tag list stored under
``JaegerTags`` (renamed so it cannot collide with Logz.io's own ``tags``
mapping).

Spark design: the whole exporter is ONE codegen'd per-span projection —
no shuffle, no Python.  Go iterates tag maps in nondeterministic map
order; a distributed engine cannot and should not promise arrival order,
so tag and reference arrays are emitted in canonical sorted order (the
same determinism trade every other exporter here makes).  At 10^12 spans
this is a pure map stage: it pipelines behind whatever scan feeds it and
scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNKNOWN_SERVICE = "unknown-service-name"   # protospan_to_jaegerthrift.go:31

_TAG_T = "array<struct<key:string,vtype:string,value:string>>"
_REF_T = (
    "array<struct<ref_type:string,trace_id_high:bigint,"
    "trace_id_low:bigint,span_id:bigint>>"
)

_U64_MOD = "18446744073709551616"        # 2^64
_I64_MAX = "9223372036854775807"


def _signed64(hex16: Column) -> Column:
    """16-hex-char id → signed int64 of its 8 big-endian bytes
    (int64(binary.BigEndian.Uint64), protospan_to_jaegerthrift.go:502-509).
    NULL when the input is not exactly 16 hex chars."""
    ok = hex16.rlike("^[0-9a-fA-F]{16}$")
    dec = F.conv(hex16, 16, 10).cast("decimal(20,0)")
    signed = F.when(
        dec > F.lit(_I64_MAX).cast("decimal(20,0)"),
        dec - F.lit(_U64_MOD).cast("decimal(21,0)"),
    ).otherwise(dec)
    return F.when(ok, signed.cast("long"))


def jaeger_ids(trace_id: Column, span_id: Column, parent_id: Column):
    """(trace_high, trace_low, span, parent, valid) columns.

    trace id: 32 hex chars split big-endian into two signed int64s
    (:493-500).  Zero ids are invalid (:198-200, :209-211); an empty or
    null PARENT id is legal and becomes 0 (:212-219)."""
    t_ok = trace_id.rlike("^[0-9a-fA-F]{32}$")
    high = F.when(t_ok, _signed64(F.substring(trace_id, 1, 16)))
    low = F.when(t_ok, _signed64(F.substring(trace_id, 17, 16)))
    span = _signed64(span_id)
    parent = F.when(
        F.coalesce(parent_id, F.lit("")) == "", F.lit(0).cast("long")
    ).otherwise(_signed64(parent_id))
    valid = (
        high.isNotNull() & low.isNotNull()
        & ~((high == 0) & (low == 0))
        & span.isNotNull() & (span != 0)
        & parent.isNotNull()
    )
    return high, low, span, parent, valid


def _jaeger_tags(attrs: Column, kind: Column, status_code: Column,
                 status_message: Column) -> Column:
    """Span tag array: typed attribute entries + the guarded span.kind and
    status tags, canonically sorted by (key, vtype, value)."""
    keys = F.transform(attrs, lambda e: e["key"])

    def tag(k, vtype, v):
        return F.struct(
            k.alias("key"), vtype.alias("vtype"), v.alias("value")
        )

    # span.kind only when absent from attrs; only client/server map
    # (:235-238, :313-334)
    kind_val = (
        F.when(kind == "SPAN_KIND_CLIENT", "client")
        .when(kind == "SPAN_KIND_SERVER", "server")
    )
    kind_tag = F.when(
        ~F.array_contains(keys, "span.kind") & kind_val.isNotNull(),
        tag(F.lit("span.kind"), F.lit("string"), kind_val),
    )
    # status tags only when attrs carry neither status key (:239-243);
    # status.code always, status.message only when non-empty (:290-311)
    no_status_attr = (
        ~F.array_contains(keys, "status.code")
        & ~F.array_contains(keys, "status.message")
    )
    code_tag = F.when(
        no_status_attr & status_code.isNotNull(),
        tag(F.lit("status.code"), F.lit("long"),
            status_code.cast("string")),
    )
    msg_tag = F.when(
        no_status_attr & status_code.isNotNull()
        & (F.coalesce(status_message, F.lit("")) != ""),
        tag(F.lit("status.message"), F.lit("string"), status_message),
    )
    computed = F.filter(
        F.array(kind_tag, code_tag, msg_tag), lambda e: e.isNotNull()
    )
    return F.array_sort(
        F.concat(F.coalesce(attrs, F.array().cast(_TAG_T)), computed)
    )


def logzio_docs(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
) -> DataFrame:
    """One Logz.io span document per input span.

    Input columns: trace_id (32 hex), span_id / parent_span_id (16 hex,
    parent empty/null for roots), name, kind (``SPAN_KIND_*``),
    status_code (int, null = no status), status_message,
    attrs ``array<struct<key,vtype,value>>`` with vtype ∈
    string|long|bool|double (pre-typed — the OC attribute ladder
    :450-491 is the decoder's concern), links
    ``array<struct<trace_id,span_id,is_parent>>``, service_name,
    resource ``map<string,string>``, start_us / end_us (epoch µs).

    Output: one row per span — Jaeger ids, operation name, references,
    startTime/duration µs + startTimeMillis (the jaeger-logzio
    ``@timestamp``), the canonical tag array under ``jaeger_tags``, the
    embedded per-span process (exporter.go:103-105), ``type`` = "span",
    and ``valid`` (invalid spans are the ones pushTraceData drops).
    """
    c = F.col
    high, low, span, parent, valid = jaeger_ids(
        c(trace_col), c(span_col), F.coalesce(c(parent_col), F.lit(""))
    )

    links = F.coalesce(
        c("links"),
        F.array().cast(
            "array<struct<trace_id:string,span_id:string,is_parent:boolean>>"
        ),
    )
    refs = F.array_sort(F.transform(
        links,
        lambda l: F.struct(
            F.when(l["is_parent"], "CHILD_OF")
            .otherwise("FOLLOWS_FROM").alias("ref_type"),
            _signed64(F.substring(l["trace_id"], 1, 16)).alias("trace_id_high"),
            _signed64(F.substring(l["trace_id"], 17, 16)).alias("trace_id_low"),
            _signed64(l["span_id"]).alias("span_id"),
        ),
    ))

    resource = F.coalesce(
        c("resource"), F.create_map().cast("map<string,string>")
    )
    # resource labels → string process tags (:162-171), sorted
    process_tags = F.array_sort(F.transform(
        F.map_entries(resource),
        lambda e: F.struct(
            e["key"].alias("key"), F.lit("string").alias("vtype"),
            e["value"].alias("value"),
        ),
    ))
    service = F.when(
        (F.coalesce(c("service_name"), F.lit("")) == "")
        & (F.size(process_tags) == 0),
        F.lit(UNKNOWN_SERVICE),
    ).otherwise(F.coalesce(c("service_name"), F.lit("")))

    start_us, end_us = c("start_us"), c("end_us")
    return spans.select(
        high.alias("trace_id_high"),
        low.alias("trace_id_low"),
        span.alias("span_id_long"),
        parent.alias("parent_span_id_long"),
        c("name").alias("operation_name"),
        refs.alias("references"),
        start_us.alias("start_us"),
        F.floor(start_us / 1000).cast("long").alias("start_ms"),
        (end_us - start_us).alias("duration_us"),
        _jaeger_tags(
            c("attrs"), c("kind"), c("status_code"), c("status_message")
        ).alias("jaeger_tags"),
        service.alias("service_name"),
        process_tags.alias("process_tags"),
        F.lit("span").alias("type"),
        valid.alias("valid"),
    )
