"""awsxray exporter analogue: span rows → X-Ray segment documents.

Reference: exporter/awsxrayexporter/translator —
  - segment.go:82-199 MakeSegment: segment vs subsegment typing, the
    segment-name priority ladder (peer.service > aws.service[+namespace
    "aws"] > db.name[@db-host] > resource service.name for SERVER spans >
    rpc.service > http.host > net.peer.name > sanitized span name), and
    namespace "remote" for CLIENT spans
  - segment.go:285-321 convertToAmazonTraceID: ``1-{8 hex epoch}-{24 hex
    id}`` where the epoch is the leading 4 bytes of the OTLP trace id,
    rejected when older than 28 days or >5 min in the future
  - segment.go:439-452 fixSegmentName: strip ``[^ 0-9\\p{L}N_.:/%&#=+,\\-@]``,
    truncate to 200, default "span"; :457-470 fixAnnotationKey: non-
    alphanumerics → ``_``
  - cause.go:30-139 makeCause: only ERROR-status spans classify; http
    status 400-499 → error (429 also throttle), everything else → fault
  - http.go:30-125,192-232 makeHTTP/constructServerURL: request URL
    assembled scheme://host[:port]target with default-port elision
  - segment.go:212-262 determineAwsOrigin: cloud.platform switch with the
    EKS > ElasticBeanstalk > ECS > EC2 presence fallback

Exception-object construction (cause.go parseException, per-language
stacktrace parsing) needs random segment IDs and language-specific parsers
and is deliberately out of scope — the deterministic classification
(error/fault/throttle) and cause message are what aggregate pipelines
consume.

Spark design: span = one row with an ``attrs MAP<STRING,STRING>`` column
(the pdata attribute map); every MakeSegment rule above is a closed-form
Column expression — coalesce ladders over ``element_at``, regexp_replace
sanitizers, a format_string trace-id rewrite — so the whole translation is
one narrow projection inside whole-stage codegen: no UDF, no shuffle, and
the JSON rendering (``to_json`` omitting nulls, like the Go struct's
omitempty tags) streams straight to the sink writer. At 10^12 spans the
operator is embarrassingly parallel; the only cluster-wide decision is the
sink partitioning, which write_fanout already handles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixSegmentName (segment.go:47): valid chars only; \p{L} + numbers kept
_INVALID_NAME_RE = r"[^ 0-9\p{L}N_.:/%&#=+,\-@]"
_MAX_NAME = 200
_DEFAULT_NAME = "span"

MAX_AGE_S = 60 * 60 * 24 * 28
MAX_SKEW_S = 60 * 5


def amazon_trace_id(trace_id: Column, now_epoch: int) -> Column:
    """convertToAmazonTraceID (segment.go:285-321) over a 32-hex trace id:
    ``1-{hex[0:8]}-{hex[8:32]}``; null when the embedded epoch is outside
    [now - 28d, now + 5m] (the reference returns an error and drops the
    span). ``now_epoch`` is a parameter so plans stay deterministic."""
    epoch = F.conv(F.substring(trace_id, 1, 8), 16, 10).cast("long")
    delta = F.lit(int(now_epoch)) - epoch
    ok = (delta <= F.lit(MAX_AGE_S)) & (delta >= F.lit(-MAX_SKEW_S))
    formatted = F.concat_ws(
        "-", F.lit("1"), F.substring(trace_id, 1, 8), F.substring(trace_id, 9, 24))
    return F.when(ok, formatted)


def fix_segment_name(name: Column) -> Column:
    cleaned = F.substring(F.regexp_replace(name, _INVALID_NAME_RE, ""), 1, _MAX_NAME)
    return F.when(F.length(cleaned) > 0, cleaned).otherwise(F.lit(_DEFAULT_NAME))


def fix_annotation_key(key: Column) -> Column:
    return F.regexp_replace(key, r"[^0-9A-Za-z]", "_")


def _a(attrs: Column, key: str) -> Column:
    return F.element_at(attrs, key)


def segment_name(attrs: Column, resource: Column, kind: Column,
                 span_name: Column) -> Column:
    """The MakeSegment naming ladder (segment.go:115-173)."""
    db_host = F.regexp_extract(
        F.coalesce(_a(attrs, "db.connection_string"), F.lit("")),
        r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    db_name = F.when(
        _a(attrs, "db.name").isNotNull(),
        F.when(db_host != "", F.concat(_a(attrs, "db.name"), F.lit("@"), db_host))
         .otherwise(_a(attrs, "db.name")))
    return F.coalesce(
        _a(attrs, "peer.service"),
        _a(attrs, "aws.service"),
        db_name,
        F.when(kind == "SERVER", _a(resource, "service.name")),
        _a(attrs, "rpc.service"),
        _a(attrs, "http.host"),
        _a(attrs, "net.peer.name"),
        fix_segment_name(span_name),
    )


def segment_namespace(attrs: Column, kind: Column) -> Column:
    """segment.go:127-130,175-177: "aws" when named via aws.service, else
    "remote" for client spans."""
    return F.when(
        _a(attrs, "peer.service").isNull() & _a(attrs, "aws.service").isNotNull(),
        F.lit("aws"),
    ).otherwise(F.when(kind == "CLIENT", F.lit("remote")))


def error_flags(status_code: Column, http_status: Column) -> tuple[Column, Column, Column]:
    """cause.go:110-139: (error, fault, throttle); non-ERROR spans are all
    false, 4xx → error (429 throttle), anything else → fault."""
    is_err_status = status_code == "ERROR"
    client = is_err_status & http_status.isNotNull() & \
        (http_status >= 400) & (http_status <= 499)
    fault = is_err_status & ~client
    throttle = client & (http_status == 429)
    return client, fault, throttle


def aws_origin(resource: Column) -> Column:
    """determineAwsOrigin (segment.go:212-262)."""
    provider_ok = _a(resource, "cloud.provider").isNull() | \
        (_a(resource, "cloud.provider") == "aws")
    platform = _a(resource, "cloud.platform")
    launch = _a(resource, "aws.ecs.launchtype")
    by_platform = (
        F.when(platform == "EKS", "AWS::EKS::Container")
         .when(platform == "ElasticBeanstalk", "AWS::ElasticBeanstalk::Environment")
         .when(platform == "ECS",
               F.when(launch == "ec2", "AWS::ECS::EC2Instance")
                .when(launch == "fargate", "AWS::ECS::Fargate")
                .otherwise("AWS::ECS::Container"))
         .when(platform == "EC2", "AWS::EC2::Instance"))
    fallback = (
        F.when(_a(resource, "k8s.cluster.name").isNotNull(), "AWS::EKS::Container")
         .when(_a(resource, "service.instance.id").isNotNull(),
               "AWS::ElasticBeanstalk::Environment")
         .when(_a(resource, "container.name").isNotNull(), "AWS::ECS::Container")
         .when(_a(resource, "host.id").isNotNull(), "AWS::EC2::Instance"))
    return F.when(provider_ok,
                  F.when(platform.isNotNull(), by_platform).otherwise(fallback))


def request_url(attrs: Column, kind: Column) -> Column:
    """constructServerURL / constructClientURL (http.go:153-232) for the
    attribute combinations the semconv defines; http.url wins outright.
    Assembly is gated on hasHTTPRequestURLAttributes (http.go:59-102):
    only http.url/http.host/http.server_name/net.host.name/host.name/
    net.peer.ip arm it — net.peer.name alone does NOT."""
    gate = (_a(attrs, "http.url").isNotNull()
            | _a(attrs, "http.host").isNotNull()
            | _a(attrs, "http.server_name").isNotNull()
            | _a(attrs, "net.host.name").isNotNull()
            | _a(attrs, "host.name").isNotNull()
            | _a(attrs, "net.peer.ip").isNotNull())
    scheme = F.coalesce(_a(attrs, "http.scheme"), F.lit("http"))
    server_host = F.coalesce(
        _a(attrs, "http.host"), _a(attrs, "http.server_name"),
        _a(attrs, "net.host.name"), _a(attrs, "host.name"))
    client_host = F.coalesce(
        _a(attrs, "http.host"), _a(attrs, "net.peer.name"), _a(attrs, "net.peer.ip"))
    host = F.when(kind == "SERVER", server_host).otherwise(client_host)
    port = F.when(kind == "SERVER", _a(attrs, "http.host_port")) \
            .otherwise(F.when(_a(attrs, "http.host").isNull(),
                              _a(attrs, "net.peer.port")))
    elide = (port.isNull() | (port == "") |
             ((scheme == "http") & (port == "80")) |
             ((scheme == "https") & (port == "443")))
    hostport = F.when(elide, host).otherwise(F.concat(host, F.lit(":"), port))
    assembled = F.concat(scheme, F.lit("://"), hostport,
                         F.coalesce(_a(attrs, "http.target"), F.lit("/")))
    return F.when(gate, F.coalesce(_a(attrs, "http.url"), assembled))


def make_segments(spans: DataFrame, now_epoch: int,
                  attrs_col: str = "attrs", resource_col: str = "resource") -> DataFrame:
    """MakeSegment over a spans DataFrame. Expects columns
    (trace_id, span_id, parent_span_id, name, kind, status_code,
    start_ts, end_ts, <attrs_col> map, <resource_col> map); rows whose
    trace-id epoch is out of range are dropped like the reference's
    per-span error path (awsxray.go:65-71)."""
    attrs, res = F.col(attrs_col), F.col(resource_col)
    kind = F.col("kind")
    http_status = _a(attrs, "http.status_code").cast("long")
    is_sub = (kind != "SERVER") & F.col("parent_span_id").isNotNull() & \
        (F.col("parent_span_id") != "")
    err, fault, throttle = error_flags(F.col("status_code"), http_status)
    out = (spans
           .withColumn("amazon_trace_id",
                       amazon_trace_id(F.col("trace_id"), now_epoch))
           .filter(F.col("amazon_trace_id").isNotNull())
           .select(
               F.col("span_id").alias("id"),
               F.col("amazon_trace_id").alias("trace_id"),
               segment_name(attrs, res, kind, F.col("name")).alias("name"),
               F.col("start_ts").cast("double").alias("start_time"),
               F.col("end_ts").cast("double").alias("end_time"),
               F.when(F.col("parent_span_id") != "",
                      F.col("parent_span_id")).alias("parent_id"),
               fault.alias("fault"), err.alias("error"),
               throttle.alias("throttle"),
               aws_origin(res).alias("origin"),
               segment_namespace(attrs, kind).alias("namespace"),
               _a(attrs, "enduser.id").alias("user"),
               F.when(is_sub, F.lit("subsegment")).alias("type"),
               F.when(_a(attrs, "http.method").isNotNull(),
                      F.struct(
                          F.struct(
                              _a(attrs, "http.method").alias("method"),
                              request_url(attrs, kind).alias("url"),
                          ).alias("request"),
                          F.struct(http_status.alias("status")).alias("response"),
                      )).alias("http"),
           ))
    return out


def to_segment_docs(segments: DataFrame) -> DataFrame:
    """Segment rows → JSON documents (the PutTraceSegments payload body);
    to_json drops null fields like the Go struct omitempty tags."""
    return segments.select(
        F.col("trace_id"),
        F.to_json(F.struct(*[F.col(c) for c in segments.columns])).alias("doc"),
    )
