"""awsxray receiver analogue: X-Ray segment JSON documents → span rows.

The exact inverse of sinks/awsxray.py (a user replaying archives exported
with PutTraceSegments ingests them through this).  Reference:
receiver/awsxrayreceiver/internal/translator/ —
  - translator.go:37 ToTraces / :84 segToSpans: one segment document plus
    its recursively-embedded subsegments flatten into independent spans;
    embedded subsegments inherit the root trace id and parent chain
  - translator.go:236-248 decodeXRayTraceID: ``1-{8 hex epoch}-{24 hex}``
    → 32-hex OTLP id, length < 35 rejected; :251-261 decodeXRaySpanID:
    exactly 16 hex
  - translator.go:176-180: a span with no parent id anywhere is SERVER
  - name.go:30-68 addNameAndNamespace: http.request.client_ip ⇒ SERVER;
    no namespace ⇒ INTERNAL (when still unspecified); namespace "aws" ⇒
    CLIENT + aws.service attr = segment name; "remote" ⇒ CLIENT; any
    other namespace is an error
  - http.go:30-73 addHTTP: request/response fields → semconv attrs,
    response status → span status (1xx-3xx unset, else error)
  - cause.go:30-100 addCause: cause ⇒ status at least ERROR; a bare
    exception-id cause becomes the status message; exception objects
    become exception events, stack frames rendered
    ``\\tat label(path: line)`` (cause.go:103-139)
  - aws.go:28-90 addAWSToResource / addAWSToSpan, sdk.go addSdkToResource,
    annotations.go (values upserted as typed attrs), metadata.go (JSON
    text under ``aws.xray.metadata.<key>``)
  - internal/aws/xray/tracesegment.go:79-100 Validate: name, id,
    start_time always required; trace_id required except for embedded
    subsegments

Spark design: one ``from_json`` per nesting level with ``subsegments``
declared ``ARRAY<STRING>`` (Spark hands nested objects back as raw JSON
text), so recursion becomes an iterative explode — level N's output frame
is level N+1's input with the inherited trace id / parent id / resource
riding along as columns.  Every rule is a Column expression (coalesce
ladders, map_from_entries over when-guarded entries, transform/aggregate
for exception events) — no Python UDF; the per-level loop is driver-side
plan construction only and depth-bounded (X-Ray docs are ≤ 64 KB, so
nesting is shallow by construction).

Deviations (documented, not silent): the reference rejects a whole UDP
packet on any invalid field — a batch engine flags the row instead
(``valid`` column, same split the exporter side uses); Go json.Marshal
re-serializes metadata values with sorted keys while Spark preserves the
raw input text of the object.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark import cacheutil

# one nesting level of an X-Ray segment document; subsegments stay raw
# JSON text so the next level parses them with this same schema
SEGMENT_SCHEMA = (
    "id STRING, name STRING, trace_id STRING, parent_id STRING, "
    "start_time DOUBLE, end_time DOUBLE, in_progress BOOLEAN, "
    "user STRING, origin STRING, namespace STRING, "
    "error BOOLEAN, throttle BOOLEAN, fault BOOLEAN, "
    "resource_arn STRING, traced BOOLEAN, "
    "http STRUCT<request: STRUCT<method STRING, client_ip STRING, "
    "user_agent STRING, url STRING, x_forwarded_for BOOLEAN>, "
    "response: STRUCT<status BIGINT, content_length STRING>>, "
    "aws STRUCT<account_id STRING, operation STRING, region STRING, "
    "request_id STRING, queue_url STRING, table_name STRING, "
    "retries BIGINT, "
    "ec2 STRUCT<availability_zone STRING, instance_id STRING, "
    "instance_size STRING, ami_id STRING>, "
    "ecs STRUCT<container STRING, availability_zone STRING, "
    "container_id STRING>, "
    "elastic_beanstalk STRUCT<environment_name STRING, deployment_id "
    "BIGINT, version_label STRING>, "
    "eks STRUCT<container_id STRING, cluster_name STRING, pod STRING>, "
    "xray STRUCT<sdk STRING, sdk_version STRING>>, "
    "sql STRUCT<url STRING, database_type STRING, sanitized_query STRING, "
    "user STRING>, "
    "service STRUCT<version STRING>, "
    "cause STRING, "
    "annotations MAP<STRING, STRING>, "
    "metadata MAP<STRING, STRING>, "
    "subsegments ARRAY<STRING>"
)

CAUSE_SCHEMA = (
    "working_directory STRING, exceptions ARRAY<STRUCT<id STRING, "
    "message STRING, type STRING, remote BOOLEAN, truncated BIGINT, "
    "skipped BIGINT, cause STRING, stack ARRAY<STRUCT<path STRING, "
    "line BIGINT, label STRING>>>>"
)

METADATA_PREFIX = "aws.xray.metadata."


def decode_trace_id(tid: Column) -> Column:
    """decodeXRayTraceID (translator.go:236-248): ``1-xxxxxxxx-x{24}`` →
    32-hex OTLP trace id; null when shorter than 35 chars or non-hex."""
    candidate = F.concat(F.substring(tid, 3, 8), F.substring(tid, 12, 24))
    ok = (F.length(tid) >= 35) & candidate.rlike("^[0-9a-fA-F]{32}$")
    return F.when(ok, F.lower(candidate))


def valid_span_id(sid: Column) -> Column:
    """decodeXRaySpanID: exactly 16 hex chars."""
    return sid.rlike("^[0-9a-fA-F]{16}$")


def _kv(key: str, value: Column, cond: Column | None = None) -> Column:
    v = value.cast("string")
    pred = v.isNotNull() if cond is None else (cond & v.isNotNull())
    # explicit cast: every entry gets the SAME nullable struct type, so
    # F.array() / casewhen accept any mix of guarded entries
    return F.when(
        pred,
        F.struct(F.lit(key).alias("key"), v.alias("value")).cast(
            "struct<key:string,value:string>"
        ),
    )


def _entries_map(entries: list[Column], *extra_entries: Column) -> Column:
    """Filtered+concatenated entry arrays → map, later arrays win on key
    collision (the Go Upsert order)."""
    arrays = [F.filter(F.array(*entries), lambda e: e.isNotNull())]
    arrays.extend(extra_entries)
    combined = arrays[0]
    for nxt in arrays[1:]:
        keys = F.transform(nxt, lambda e: e["key"])
        combined = F.concat(
            F.filter(combined, lambda e: ~F.array_contains(keys, e["key"])),
            nxt,
        )
    return F.map_from_entries(combined)


def _bool_str(col: Column) -> Column:
    """pdata bool attrs stringify as true/false."""
    return F.when(col.isNotNull(), F.when(col, "true").otherwise("false"))


def _span_attrs(p: Column) -> Column:
    """populateSpan's attribute upsert sequence (translator.go:184-199):
    in_progress, enduser.id, HTTP, AWS, SQL, traced, then annotations,
    then metadata — later writes win."""
    req = p["http"]["request"]
    resp = p["http"]["response"]
    aws = p["aws"]
    sql = p["sql"]
    # sql.go splitSQLURL: ^(.+//.+)/([^?]+)\??.*$ → (connection, db name)
    sql_conn = F.regexp_extract(sql["url"], r"^(.+\/\/.+)\/([^\?]+)\??.*$", 1)
    sql_db = F.regexp_extract(sql["url"], r"^(.+\/\/.+)\/([^\?]+)\??.*$", 2)
    base = [
        _kv("aws.xray.inprogress", _bool_str(p["in_progress"])),
        _kv("enduser.id", p["user"]),
        _kv("http.method", req["method"]),
        _kv("http.client_ip", req["client_ip"]),
        _kv("http.user_agent", req["user_agent"]),
        _kv("http.url", req["url"]),
        _kv("aws.xray.x_forwarded_for", _bool_str(req["x_forwarded_for"])),
        _kv("http.status_code", resp["status"]),
        _kv("http.response_content_length", resp["content_length"]),
        _kv("aws.account_id", aws["account_id"]),
        _kv("aws.operation", aws["operation"]),
        _kv("aws.region", aws["region"]),
        _kv("aws.request_id", aws["request_id"]),
        _kv("aws.queue_url", aws["queue_url"]),
        _kv("aws.table_name", aws["table_name"]),
        _kv("aws.xray.retries", aws["retries"]),
        _kv("db.connection_string", F.when(sql_conn != "", sql_conn)),
        _kv("db.name", F.when(sql_db != "", sql_db)),
        _kv("db.system", sql["database_type"]),
        _kv("db.statement", sql["sanitized_query"]),
        _kv("db.user", sql["user"]),
        _kv("aws.xray.traced", _bool_str(p["traced"])),
        # namespace "aws" ⇒ aws.service = segment name (name.go:59-61)
        _kv("aws.service", F.when(p["namespace"] == "aws", p["name"])),
    ]
    anno = F.coalesce(
        F.map_entries(p["annotations"]),
        F.array().cast("array<struct<key:string,value:string>>"),
    )
    meta = F.coalesce(
        F.transform(
            F.map_entries(p["metadata"]),
            lambda e: F.struct(
                F.concat(F.lit(METADATA_PREFIX), e["key"]).alias("key"),
                e["value"].alias("value"),
            ),
        ),
        F.array().cast("array<struct<key:string,value:string>>"),
    )
    return _entries_map(base, anno, meta)


def _resource_attrs(p: Column) -> Column:
    """populateResource (translator.go:203-219) + aws.go addAWSToResource
    + sdk.go addSdkToResource; only the ROOT segment contributes — all
    flattened spans of one document share it."""
    aws = p["aws"]
    sdk = aws["xray"]["sdk"]
    has_exceptions = (
        F.coalesce(
            F.size(F.from_json(p["cause"], CAUSE_SCHEMA)["exceptions"]), F.lit(0)
        )
        > 0
    )
    # sdk.go: with exceptions assume java; else the suffix after the FIRST
    # "for " (strings.Index) — lazy prefix, not substring_index's last
    sdk_lang = F.when(
        sdk.isNotNull(),
        F.when(has_exceptions, F.lit("java")).otherwise(
            F.when(
                sdk.contains("for "),
                F.regexp_extract(sdk, r"^.*?for (.*)$", 1),
            )
        ),
    )
    entries = [
        _kv(
            "cloud.provider",
            F.when(aws.isNotNull(), F.lit("aws")).otherwise(F.lit("unknown")),
        ),
        _kv("cloud.account.id", aws["account_id"]),
        _kv("cloud.zone", F.coalesce(
            aws["ec2"]["availability_zone"], aws["ecs"]["availability_zone"]
        )),
        _kv("host.id", aws["ec2"]["instance_id"]),
        _kv("host.type", aws["ec2"]["instance_size"]),
        _kv("host.image.id", aws["ec2"]["ami_id"]),
        _kv("container.name", aws["ecs"]["container"]),
        _kv("container.id", F.coalesce(
            aws["eks"]["container_id"], aws["ecs"]["container_id"]
        )),
        _kv("service.namespace", aws["elastic_beanstalk"]["environment_name"]),
        _kv("service.instance.id", aws["elastic_beanstalk"]["deployment_id"]),
        # beanstalk version_label written first, seg.Service.Version upserts
        # over it (translator.go:210-216) — one coalesced entry here
        _kv(
            "service.version",
            F.coalesce(
                p["service"]["version"],
                aws["elastic_beanstalk"]["version_label"],
            ),
        ),
        _kv("k8s.cluster.name", aws["eks"]["cluster_name"]),
        _kv("k8s.pod.name", aws["eks"]["pod"]),
        _kv("telemetry.sdk.version", aws["xray"]["sdk_version"]),
        _kv("telemetry.sdk.name", sdk),
        _kv("telemetry.sdk.language", sdk_lang),
        _kv("aws.xray.resource_arn", p["resource_arn"]),
    ]
    return _entries_map(entries)


def _exception_events(p: Column) -> Column:
    """cause.go:56-100: exception-object causes → one exception event per
    exception, stack frames rendered ``Type: Message\\n\\tat label(path:
    line)\\n`` (cause.go:103-139)."""
    cause = F.from_json(p["cause"], CAUSE_SCHEMA)

    def one(ex: Column) -> Column:
        header = F.concat(ex["type"], F.lit(": "), ex["message"], F.lit("\n"))
        frames = F.aggregate(
            F.coalesce(
                ex["stack"],
                F.array().cast(
                    "array<struct<path:string,line:bigint,label:string>>"
                ),
            ),
            F.lit(""),
            lambda acc, fr: F.concat(
                acc,
                F.lit("\tat "),
                fr["label"],
                F.lit("("),
                fr["path"],
                F.lit(": "),
                fr["line"].cast("string"),
                F.lit(")\n"),
            ),
        )
        stacktrace = F.when(
            F.size(F.coalesce(ex["stack"], F.array().cast(
                "array<struct<path:string,line:bigint,label:string>>"
            ))) > 0,
            F.concat(header, frames),
        )
        return F.struct(
            F.lit("exception").alias("name"),
            _entries_map(
                [
                    _kv("aws.xray.exception.id", ex["id"]),
                    _kv("exception.message", ex["message"]),
                    _kv("exception.type", ex["type"]),
                    _kv("aws.xray.exception.remote", _bool_str(ex["remote"])),
                    _kv("aws.xray.exception.truncated", ex["truncated"]),
                    _kv("aws.xray.exception.skipped", ex["skipped"]),
                    _kv("aws.xray.exception.cause", ex["cause"]),
                    _kv("exception.stacktrace", stacktrace),
                ]
            ).alias("attrs"),
        )

    return F.when(
        cause["exceptions"].isNotNull(), F.transform(cause["exceptions"], one)
    )


def _level_spans(level: DataFrame) -> DataFrame:
    """One nesting level: parsed segment JSON + inherited context → span
    rows.  ``inh_trace``/``inh_parent`` are null at the root."""
    p = F.col("p")
    inh_trace, inh_parent = F.col("inh_trace"), F.col("inh_parent")
    raw_trace = F.coalesce(p["trace_id"], inh_trace)
    parent = F.coalesce(inh_parent, p["parent_id"])
    cause_present = p["cause"].isNotNull()
    # a bare string cause is the exception id (cause.go:47-53); Spark's
    # parser hands an object back as "{...}" text
    cause_is_id = cause_present & ~F.col("p")["cause"].startswith("{")
    http_status = p["http"]["response"]["status"]
    # http.go:48-53 via StatusCodeFromHTTP (1xx-3xx leave the status
    # unset, 4xx/5xx error) then cause.go:41-44 lifts unset to ERROR
    http_error = http_status.isNotNull() & (
        (http_status < 100) | (http_status > 399)
    )
    status = F.when(http_error | cause_present, "ERROR").otherwise("UNSET")
    kind = (
        F.when(parent.isNull() | (parent == ""), "SERVER")
        .when(p["http"]["request"]["client_ip"].isNotNull(), "SERVER")
        .when(p["namespace"].isNull(), "INTERNAL")
        .otherwise("CLIENT")
    )
    valid = (
        p["name"].isNotNull()
        & p["id"].isNotNull()
        & valid_span_id(p["id"])
        & p["start_time"].isNotNull()
        # root + independent subsegments must carry a decodable trace id
        & decode_trace_id(raw_trace).isNotNull()
        # name.go:64-66: unexpected namespace is an error
        & (p["namespace"].isNull() | p["namespace"].isin("aws", "remote"))
    )
    resource = F.coalesce(F.col("inh_resource"), _resource_attrs(p))
    return level.select(
        decode_trace_id(raw_trace).alias("trace_id"),
        F.lower(p["id"]).alias("span_id"),
        F.when(parent != "", F.lower(parent)).alias("parent_span_id"),
        p["name"].alias("name"),
        kind.alias("kind"),
        F.timestamp_seconds(p["start_time"]).alias("start_ts"),
        F.timestamp_seconds(p["end_time"]).alias("end_ts"),
        status.alias("status_code"),
        F.when(cause_is_id, p["cause"]).alias("status_message"),
        _span_attrs(p).alias("attrs"),
        resource.alias("resource"),
        _exception_events(p).alias("events"),
        p["origin"].alias("origin"),
        valid.alias("valid"),
    )


def segments_to_spans(
    docs: DataFrame, doc_col: str = "doc", max_depth: int = 8
) -> DataFrame:
    """Flatten X-Ray segment documents (with embedded subsegments) into
    span rows — ToTraces/segToSpans as an iterative explode.

    ``max_depth`` bounds the plan depth; levels stop early as soon as a
    level carries no subsegments (X-Ray limits a document to 64 KB so
    real nesting is shallow).

    Each level is PERSISTED and fully materialized (the next-level count
    scans every partition, pulling the level into cache from its cached
    parent) before the next level derives from it.  So every per-depth
    output branch in the final union and every early-exit probe reads
    its level's parsed structs from cache once — the unpersisted plan
    re-derived the whole ``from_json`` ancestor chain per depth AND per
    probe, O(depth²) JSON parses of the raw documents.  The chain of
    pinned levels lives under one cacheutil key, evicted at the next
    invocation (or ``cacheutil.release_all``), never mid-build.
    """
    cacheutil.release("xray_levels")
    level = cacheutil.track_append(
        docs.select(
            F.from_json(F.col(doc_col), SEGMENT_SCHEMA).alias("p"),
            F.lit(None).cast("string").alias("inh_trace"),
            F.lit(None).cast("string").alias("inh_parent"),
            F.lit(None).cast("map<string,string>").alias("inh_resource"),
        ),
        key="xray_levels",
    )
    outputs = []
    for depth in range(max_depth):
        outputs.append(_level_spans(level))
        if depth + 1 == max_depth:
            break
        children = level.select(
            F.coalesce(F.col("p")["trace_id"], F.col("inh_trace")).alias(
                "inh_trace"
            ),
            F.col("p")["id"].alias("inh_parent"),
            F.coalesce(F.col("inh_resource"), _resource_attrs(F.col("p"))).alias(
                "inh_resource"
            ),
            F.explode(F.col("p")["subsegments"]).alias("doc"),
        )
        level = cacheutil.track_append(
            children.select(
                F.from_json(F.col("doc"), SEGMENT_SCHEMA).alias("p"),
                "inh_trace",
                "inh_parent",
                "inh_resource",
            ),
            key="xray_levels",
        )
        if level.count() == 0:
            break
    return reduce(DataFrame.unionByName, outputs)
