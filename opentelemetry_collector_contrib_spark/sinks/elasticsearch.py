"""Elasticsearch exporter analogue: log rows -> JSON documents.

Reference: exporter/elasticsearchexporter/model.go:40-62 — encodeLog builds
one JSON document per record with ``@timestamp`` first (data-stream
template compatibility), then SeverityText / SeverityNumber / Name, the
body, and ``Attributes`` / ``Resource`` sub-objects.

Spark design: the whole document is one ``to_json(struct(...))`` projection
— JVM-side, codegen'd, no Python. Field order is the struct order (fixed,
mirroring encodeLog's Add* sequence); null fields are omitted, matching
objmodel.Document's ignore-empty serialization. The bulk-index transport is
out of scope (sinks are table writes, SURVEY.md section 2.8) — a real
deployment writes these docs to the ES bulk API or an Iceberg staging
table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_es_docs(
    df: DataFrame,
    ts_col: str,
    name_col: str,
    body_col: str,
    attr_cols: list[str],
    resource_cols: list[str] | None = None,
    severity_text_col: str | None = None,
    severity_number_col: str | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """rows -> (id_cols..., doc) with ``doc`` the serialized ES document."""
    fields: list[Column] = [
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss").alias("@timestamp")
    ]
    if severity_text_col:
        fields.append(F.col(severity_text_col).alias("SeverityText"))
    if severity_number_col:
        fields.append(F.col(severity_number_col).alias("SeverityNumber"))
    fields.append(F.col(name_col).alias("Name"))
    fields.append(F.col(body_col).alias("Body"))
    fields.append(
        F.struct(*[F.col(c).alias(c) for c in attr_cols]).alias("Attributes")
    )
    if resource_cols:
        fields.append(
            F.struct(*[F.col(c).alias(c) for c in resource_cols]).alias("Resource")
        )
    out_cols = [F.col(c) for c in (id_cols or [])]
    return df.select(*out_cols, F.to_json(F.struct(*fields)).alias("doc"))
