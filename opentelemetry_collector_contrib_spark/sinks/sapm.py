"""SAPM exporter analogue: spans → per-access-token gzip'd trace batches.

Reference: exporter/sapmexporter/exporter.go —
  - pushTraceData groups the trace data by the access-token resource
    attribute (``com.splunk.signalfx.access_token``) when
    AccessTokenPassthrough is on, so each export call carries one token
    cohort (exporter.go:96-128; the batchperresourceattr wrapper in
    newSAPMTracesExporter:75-82 enforces the same batching upstream);
  - filterToken / filterTokenFromProcess (exporter.go:145-165): the token
    tag is REMOVED from process tags before serialization — credentials
    never reach the payload;
  - the sapm client gzip-compresses the serialized batch unless
    ``disable_compression`` (config.go:51-52).

Spark design: one groupBy(access_token) building a canonically-ordered
span array per batch (sort_array over structs — deterministic bytes), a
JVM ``to_json`` serialization, and an Arrow-batched pandas UDF for the
gzip step (fixed mtime=0 → byte-deterministic output; gzip is a binary
codec with no JVM-expression equivalent, the same honest trade as the
fluentforward msgpack decoder).  At 10^12 spans the per-token cohorts are
further size-chunked before collect_list (the client chunks batches the
same way) — the grouping key would become (token, chunk_id) with
chunk_id = row_number over token // chunk_rows.
"""

from __future__ import annotations

import gzip as _gzip

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

TOKEN_ATTR = "com.splunk.signalfx.access_token"


@pandas_udf("binary")
def _gzip_bytes(payload: pd.Series) -> pd.Series:
    # mtime=0 pins the gzip header — identical input -> identical bytes
    return payload.map(
        lambda s: _gzip.compress(s.encode("utf-8"), mtime=0)
        if s is not None
        else None
    )


def sapm_batches(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    name_col: str = "name",
    resource_col: str = "resource",
    passthrough: bool = True,
    disable_compression: bool = False,
) -> DataFrame:
    """spans (with a ``resource`` MAP column) → one row per export batch.

    Output: access_token, n_spans, n_traces, process_tags (scrubbed,
    canonical ``k=v`` comma-joined — token filtered out), payload
    (canonical JSON of the sorted span array), payload_gzip (NULL when
    compression is disabled).
    """
    res = F.col(resource_col)
    token = (
        F.coalesce(F.element_at(res, TOKEN_ATTR), F.lit(""))
        if passthrough
        else F.lit("")
    )
    # filterTokenFromProcess: the token never reaches the payload
    scrubbed = F.map_filter(res, lambda k, _v: k != F.lit(TOKEN_ATTR))
    tags_str = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(scrubbed),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            )
        ),
        ",",
    )
    prepared = spans.select(
        token.alias("access_token"),
        tags_str.alias("process_tags"),
        F.struct(
            F.col(trace_col).alias("trace_id"),
            F.col(span_col).alias("span_id"),
            F.col(name_col).alias("name"),
        ).alias("__span"),
        F.col(trace_col).alias("__trace"),
    )
    batches = prepared.groupBy("access_token", "process_tags").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("__trace").alias("n_traces"),
        F.to_json(F.sort_array(F.collect_list("__span"))).alias("payload"),
    )
    if disable_compression:
        return batches.withColumn("payload_gzip", F.lit(None).cast("binary"))
    return batches.withColumn("payload_gzip", _gzip_bytes(F.col("payload")))
