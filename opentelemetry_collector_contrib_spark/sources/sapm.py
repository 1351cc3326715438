"""SAPM receiver analogue: per-token gzip'd trace batches → span rows.

Reference: receiver/sapmreceiver/trace_receiver.go:64-99 (handleRequest) —
  - ``sapmprotocol.ParseTraceV2Request`` unwraps the HTTP payload,
    transparently gunzipping when Content-Encoding is gzip (the exporter
    side compresses unless ``disable_compression``);
  - the batches translate to internal traces
    (``jaegertranslator.ProtoBatchesToInternalTraces``) — each batch's
    process tags become the resource attributes of every span in it;
  - AccessTokenPassthrough (trace_receiver.go:80-89): the access token
    travels OUT OF BAND (the ``X-SF-Token`` header, never the payload —
    the exporter scrubbed it) and is UPSERTED into each resource's
    attributes as ``com.splunk.signalfx.access_token``.

This is the exact inverse of sinks/sapm.py (same round-trip pattern as
carbon/wavefront/splunkhec): batch rows (access_token, process_tags,
payload | payload_gzip) → one row per span with the resource map
rebuilt.  The gunzip step is an Arrow-batched pandas UDF over batch rows
(one row per EXPORT BATCH, tiny cardinality — same honest trade as the
gzip on the exporter side); everything after is JVM ``from_json`` +
higher-order expressions, no Python in the per-span path.
"""

from __future__ import annotations

import gzip as _gzip

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from opentelemetry_collector_contrib_spark.sinks.sapm import TOKEN_ATTR

_SPAN_SCHEMA = "array<struct<name:string,span_id:string,trace_id:string>>"


@pandas_udf("string")
def _gunzip_text(payload: pd.Series) -> pd.Series:
    # inverse of sinks/sapm._gzip_bytes (mtime is irrelevant on decode)
    return payload.map(
        lambda b: _gzip.decompress(bytes(b)).decode("utf-8")
        if b is not None
        else None
    )


def parse_sapm_batches(
    batches: DataFrame,
    payload_col: str = "payload",
    gzip_col: str | None = "payload_gzip",
    token_col: str = "access_token",
    tags_col: str = "process_tags",
    passthrough: bool = True,
) -> DataFrame:
    """Batch rows → span rows (trace_id, span_id, name, resource).

    When ``gzip_col`` is given, non-NULL compressed payloads are
    gunzipped and take precedence over ``payload_col`` (the receiver
    honors Content-Encoding before falling back to identity).  The
    resource map is the batch's process tags; with ``passthrough`` the
    batch token (when non-empty) is upserted under ``TOKEN_ATTR`` —
    trace_receiver.go:80-89.
    """
    payload = F.col(payload_col)
    if gzip_col is not None:
        payload = F.coalesce(_gunzip_text(F.col(gzip_col)), payload)
    tags_str = F.col(tags_col)
    tag_tokens = F.when(
        F.coalesce(tags_str, F.lit("")) == "",
        F.array().cast("array<string>"),
    ).otherwise(F.split(tags_str, ","))
    # keys came from a MAP on the exporter side, so they are unique;
    # values may themselves contain '=' (tag[idx+1:], same contract as
    # the carbon tag split)
    resource = F.map_from_arrays(
        F.transform(tag_tokens, lambda t: F.substring_index(t, "=", 1)),
        F.transform(tag_tokens, lambda t: F.regexp_replace(t, "^[^=]*=", "")),
    )
    if passthrough:
        token = F.coalesce(F.col(token_col), F.lit(""))
        resource = F.when(
            token == "", resource
        ).otherwise(
            # UpsertString: drop any stale entry, then append the header's
            F.map_concat(
                F.map_filter(resource, lambda k, _v: k != F.lit(TOKEN_ATTR)),
                F.create_map(F.lit(TOKEN_ATTR), token),
            )
        )
    span = F.explode(F.from_json(payload, _SPAN_SCHEMA)).alias("span")
    return batches.select(resource.alias("resource"), span).select(
        F.col("span.trace_id").alias("trace_id"),
        F.col("span.span_id").alias("span_id"),
        F.col("span.name").alias("name"),
        "resource",
    )
